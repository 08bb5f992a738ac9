"""Round-3 operators: AnalyzingSuggester, WordBreakSpellChecker,
UAX29URLEmail/Mapping/EdgeNGram analyzers, CommonTermsQuery."""

import pandas as pd
import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.analysis.analyzers import (
    EdgeNGramAnalyzer,
    MappingAnalyzer,
    NGramAnalyzer,
    UAX29URLEmailAnalyzer,
)
from lucenenet_spark.search.common_terms import common_terms_query
from lucenenet_spark.search.queries import BooleanQuery, Occur
from lucenenet_spark.search.suggest import (
    AnalyzingSuggester,
    word_breaks,
    word_combinations,
)


# ------------------------------------------------------------- analyzers
def test_uax29_url_email_tokens():
    a = UAX29URLEmailAnalyzer()
    assert a.terms("go to https://Ex.com/p?q=1 now") == ["go", "https://ex.com/p?q=1", "now"]
    assert a.terms("mail Bob.S+x@m.example please") == ["mail", "bob.s+x@m.example", "please"]
    assert a.terms("see www.example.org/x today") == ["see", "www.example.org/x", "today"]
    # non-URL text tokenizes exactly like the standard chain
    assert a.terms("The quick-brown fox") == ["quick", "brown", "fox"]


def test_mapping_char_filter_longest_first():
    a = MappingAnalyzer({"&": " and ", "-": ""})
    assert a.terms("mer-ge cats&dogs") == ["merge", "cats", "dogs"]


def test_edge_ngram_positions_and_norm_length():
    a = EdgeNGramAnalyzer(2, 5)
    rows, terms, pos, fl = a.tokenize_batch(pd.Series(["merge key a"]))
    assert list(terms) == ["me", "mer", "merg", "merge", "ke", "key"]
    # grams share their source token's position ('a' is a stopword)
    assert list(pos) == [0, 0, 0, 0, 1, 1]
    # discountOverlaps: 2 source tokens -> norm length 2
    assert list(fl) == [2]


def test_ngram_all_substrings():
    a = NGramAnalyzer(2, 3)
    assert list(a.tokenize_batch(pd.Series(["abcd"]))[1]) == ["ab", "bc", "cd", "abc", "bcd"]


# ------------------------------------------------------------- suggest
@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (0, "data processing the spark engine"),
        (1, "fast merge fast merge value"),
        (2, "the spark spark row"),
        (3, "value key fast"),
    ]
    return build_index(spark.createDataFrame(rows, "doc_id long, text string")).cache()


def test_analyzing_suggester_drops_stopwords_and_exact_first(spark):
    ent = spark.createDataFrame(
        [("the spark", 7), ("spark engine", 9), ("sparkly", 3), ("apache spark", 5)],
        "surface string, weight long",
    )
    sug = AnalyzingSuggester(ent)
    got = [(r["surface"], r["weight"]) for r in sug.lookup("spark", 4).collect()]
    # 'the spark' analyzes to exactly 'spark' -> exact-first despite weight 7;
    # 'apache spark' does not START with the analyzed key
    assert got == [("the spark", 7), ("spark engine", 9), ("sparkly", 3)]
    # preserve_sep: 'spark e' must match 'spark engine' only
    got2 = [r["surface"] for r in sug.lookup("spark e", 4).collect()]
    assert got2 == ["spark engine"]


def test_word_breaks(idx):
    out = [(r["left_w"], r["right_w"]) for r in word_breaks(idx, "fastmerge", n=3).collect()]
    assert ("fast", "merge") in out


def test_word_combinations(idx):
    out = [(r["combined"], r["freq"]) for r in word_combinations(idx, ["val", "ue", "key"]).collect()]
    assert out and out[0][0] == "value"


# ------------------------------------------------------------- common terms
def test_common_terms_split_and_scoring(idx):
    s = IndexSearcher(idx, mode="lucene")
    # df: fast=2 docs, value=2, spark=2, row=1 (4 docs total)
    q = common_terms_query(s, ["fast", "row"], max_term_frequency=0.25)
    # fast df=2 > ceil(0.25*4)=1 -> high; row df=1 -> low (required)
    assert isinstance(q, BooleanQuery)
    occurs = {c.occur for c in q.clauses}
    assert occurs == {Occur.MUST, Occur.SHOULD}
    docs = {r["doc_id"] for r in s.scored(q).collect()}
    assert docs == {2}  # only docs containing 'row'; 'fast' optional

    # high-only -> conjunction rewrite (all clauses promoted to MUST)
    q2 = common_terms_query(s, ["fast", "value"], max_term_frequency=0.25)
    assert all(c.occur is Occur.MUST for c in q2.clauses)
    assert {r["doc_id"] for r in s.scored(q2).collect()} == {1, 3}

    # low-only -> plain SHOULD disjunction
    q3 = common_terms_query(s, ["spark", "row"], max_term_frequency=0.9)
    assert all(c.occur is Occur.SHOULD for c in q3.clauses)
    assert {r["doc_id"] for r in s.scored(q3).collect()} == {0, 2}
