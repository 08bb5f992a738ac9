"""Round-5o tests: SimHash banded near-duplicate pairs (Manku WWW'07
pigeonhole correctness + bucket-cap behavior) and AnalyzingQueryParser
(analyzed wildcard/prefix/fuzzy expanded terms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzers import EnglishAnalyzer
from lucenenet_spark.functions.dedup import simhash64, simhash_near_duplicates
from lucenenet_spark.queryparser.analyzing import AnalyzingQueryParser
from lucenenet_spark.queryparser.parser import QueryParser
from lucenenet_spark.search.queries import FuzzyQuery, PrefixQuery, WildcardQuery

DOCS = [
    (0, "spark query merge spark spark"),
    (1, "spark query merge spark scan"),  # near-dup of 0
    (2, "table scan vector index build"),
    (3, "table scan vector index merge"),  # near-dup of 2
    (4, "completely different words here entirely"),
    (5, "spark query merge spark spark"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def terms(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    return tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))


# ------------------------------------------------------- simhash near-dup
def test_banding_matches_brute_force(terms):
    """Pigeonhole guarantee: 4 bands over 16 bits lose NO pair with
    hamming <= 3 — band join == all-pairs filter."""
    fp = simhash64(terms, tf_col="tf", n_bits=16)
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long")
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_duplicates(
            terms, n_bits=16, n_bands=4, max_hamming=3, max_bucket_size=None
        ).collect()
    }
    assert banded == brute
    # the exact duplicate pair is always present at hamming 0
    assert (0, 5, 0) in banded


def test_exact_dup_any_band_count(terms):
    # hamming <= 3 with MORE bands than required still finds everything
    eight = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_duplicates(
            terms, n_bits=16, n_bands=8, max_hamming=3, max_bucket_size=None
        ).collect()
    }
    four = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_duplicates(
            terms, n_bits=16, n_bands=4, max_hamming=3, max_bucket_size=None
        ).collect()
    }
    assert four == eight


def test_bucket_cap_drops_cluster(terms):
    # cap of 1 drops every band bucket shared by >= 2 docs; with 6 docs of
    # shared vocabulary nothing can pair up
    capped = simhash_near_duplicates(
        terms, n_bits=16, n_bands=4, max_hamming=3, max_bucket_size=1
    )
    assert capped.count() == 0


def test_parameter_validation(terms):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(terms, n_bits=16, n_bands=3, max_hamming=3)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_duplicates(terms, n_bits=60, n_bands=8, max_hamming=3)


def test_survivors_keep_one_per_component(spark, terms):
    from lucenenet_spark.functions.dedup import near_duplicate_survivors

    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    # chain component {0,1,5} via pairs (0,1),(1,5); component {2,3}; 4 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 5), (2, 3)], ["doc_a", "doc_b"]
    )
    kept = sorted(r.doc_id for r in near_duplicate_survivors(docs, pairs).collect())
    assert kept == [0, 2, 4]  # min-id per component + the unpaired doc


# --------------------------------------------------- AnalyzingQueryParser
def test_prefix_analyzed_vs_classic():
    en = EnglishAnalyzer()
    aq = AnalyzingQueryParser(analyzer=en).parse("Merge*")
    cq = QueryParser(analyzer=en).parse("Merge*")
    assert isinstance(aq, PrefixQuery) and aq.prefix == "merg"
    assert isinstance(cq, PrefixQuery) and cq.prefix == "merge"


def test_wildcard_chunks_analyzed():
    q = AnalyzingQueryParser(analyzer=EnglishAnalyzer()).parse("MER*ed?")
    assert isinstance(q, WildcardQuery)
    # chunks 'MER' and 'ed' each analyze to one token; wildcards preserved
    assert q.pattern == "mer*ed?"


def test_fuzzy_analyzed():
    q = AnalyzingQueryParser(analyzer=EnglishAnalyzer()).parse("Merged~1")
    assert isinstance(q, FuzzyQuery)
    assert q.term == "merg" and q.max_edits == 1


# ------------------------------------------------------ WikipediaTokenizer
def test_wiki_token_types():
    from lucenenet_spark.analysis.wikipedia import wiki_tokens

    text = (
        "=== Early life ===\n"
        "== Career ==\n"
        "'''''Strong''''' '''bold''' ''soft'' plain "
        "[[Alan Smithee|the director]] [[Category:Films]] "
        "[http://example.com/x home page] <ref>cite me</ref>"
    )
    toks = wiki_tokens(text)
    by_type: dict[str, list[str]] = {}
    for term, ttype, _ in toks:
        by_type.setdefault(ttype, []).append(term)
    assert by_type["sh"] == ["early", "life"]
    assert by_type["h"] == ["career"]
    assert by_type["bi"] == ["strong"]
    assert by_type["b"] == ["bold"]
    assert by_type["i"] == ["soft"]
    assert by_type["il"] == ["alan", "smithee"]
    assert by_type["c"] == ["films"]
    assert by_type["elu"] == ["http://example.com/x"]
    assert by_type["el"] == ["home", "page"]
    assert by_type["ci"] == ["cite", "me"]
    # piped display text and bare words are plain alphanumerics
    assert by_type[""] == ["plain", "the", "director"]
    # positions: one per emitted token, reading order, no gaps
    assert [p for (_, _, p) in toks] == list(range(len(toks)))


def test_wiki_tokens_distributed(spark):
    from lucenenet_spark.analysis.wikipedia import wiki_typed_tokens

    df = spark.createDataFrame(
        [(0, "[[Link]] word"), (1, "''it'' x")], "doc_id long, text string"
    )
    rows = sorted(
        (r.doc_id, r.term, r.type, r.pos) for r in wiki_typed_tokens(df).collect()
    )
    assert rows == [
        (0, "link", "il", 0),
        (0, "word", "", 1),
        (1, "it", "i", 0),
        (1, "x", "", 1),
    ]


def test_multi_token_chunk_rejected():
    with pytest.raises(ValueError, match="multiple terms"):
        AnalyzingQueryParser().parse("one\\ two*")


def test_empty_chunk_rejected():
    # 'the' is a stopword: analyzer returns nothing for the chunk
    with pytest.raises(ValueError, match="nothing"):
        AnalyzingQueryParser().parse("the*")
