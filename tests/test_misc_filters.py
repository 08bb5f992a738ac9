"""Scandinavian normalization/folding + hyphenated-word reassembly —
golden vectors from the reference's own test suites
(Tests.Analysis.Common/Analysis/Miscellaneous/Test{Scandinavian
NormalizationFilter,ScandinavianFoldingFilter,HyphenatedWordsFilter}.cs)."""

from lucenenet_spark.analysis.misc_filters import (
    HyphenatedWordsAnalyzer,
    ScandinavianFoldingAnalyzer,
    merge_hyphenated,
    scandinavian_fold,
    scandinavian_normalize,
)


def test_scandinavian_normalization_reference_vectors():
    vectors = [
        ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"),
        ("aeaeeeae", "ææeeæ"), ("bøen", "bøen"), ("bOEen", "bØen"),
        ("åene", "åene"), ("blåbærsyltetøj", "blåbærsyltetøj"),
        ("blaabaersyltetöj", "blåbærsyltetøj"),
        ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
        ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
        ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
        ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
        ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
        ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"), ("ae", "æ"),
    ]
    for src, expect in vectors:
        assert scandinavian_normalize(src) == expect, src


def test_scandinavian_folding_reference_vectors():
    vectors = [
        ("aeaeeeae", "aaeea"), ("bøen", "boen"), ("åene", "aene"),
        ("blåbærsyltetøj", "blabarsyltetoj"),
        ("blaabaarsyltetoej", "blabarsyltetoj"),
        ("blåbärsyltetöj", "blabarsyltetoj"),
        ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
        ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
        ("ræksmörgaos", "raksmorgas"),
        ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
        ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
        ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
        ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
        ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
        ("ö", "o"), ("ø", "o"), ("Ö", "O"), ("Ø", "O"),
    ]
    for src, expect in vectors:
        assert scandinavian_fold(src) == expect, src


def test_hyphenated_words_reference_vectors():
    # the reference's three HyphenatedWordsFilter cases: merge across
    # the break, keep interior hyphens, keep a dangling final hyphen,
    # merge chains transitively
    assert (
        merge_hyphenated(
            "ecologi- cal develop comprehensive-hands-on and ecologi- cal"
        )
        == "ecological develop comprehensive-hands-on and ecological"
    )
    assert (
        merge_hyphenated(
            "ecologi- cal develop comprehensive-hands-on and ecology-"
        )
        == "ecological develop comprehensive-hands-on and ecology-"
    )
    assert merge_hyphenated("ab- cd- ef geh 1234- 5678-") == (
        "abcdef geh 12345678-"
    )


def test_filter_analyzers_restore_corrupted_corpus(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    df = spark.createDataFrame(
        [(0, "bätch job ran"), (1, "vælue stored"), (2, "cus- tomer paid")],
        "doc_id long, text string",
    )
    s = IndexSearcher(
        build_index(df.filter(F.col("doc_id") < 2),
                    analyzer=ScandinavianFoldingAnalyzer())
    )
    assert {r["doc_id"] for r in s.search(TermQuery("batch"), 5).collect()} == {0}
    assert {r["doc_id"] for r in s.search(TermQuery("value"), 5).collect()} == {1}
    s2 = IndexSearcher(
        build_index(df.filter(F.col("doc_id") == 2),
                    analyzer=HyphenatedWordsAnalyzer())
    )
    assert {r["doc_id"] for r in s2.search(TermQuery("customer"), 5).collect()} == {2}


def test_keyword_repeat_stem_chain(spark):
    import pandas as pd

    from lucenenet_spark.analysis.misc_filters import KeywordRepeatStemAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    a = KeywordRepeatStemAnalyzer()
    _, terms, pos, lens = a.tokenize_batch(pd.Series(["merges batch testing"]))
    got = sorted(zip(terms.tolist(), pos.tolist()))
    # surface + stem overlap; stem==surface deduped (batch)
    assert ("merges", 0) in got and ("merg", 0) in got
    assert ("testing", 2) in got and ("test", 2) in got
    assert got.count(("batch", 1)) == 1
    assert lens[0] == 3  # norms count surface tokens only

    df = spark.createDataFrame(
        [(0, "merges done"), (1, "merge done"), (2, "other work")],
        "doc_id long, text string",
    )
    s = IndexSearcher(build_index(df, analyzer=KeywordRepeatStemAnalyzer()))
    # exact surface form stays precise...
    assert {r["doc_id"] for r in s.search(TermQuery("merges"), 5).collect()} == {0}
    # ...while the stem class unifies the inflections
    assert {r["doc_id"] for r in s.search(TermQuery("merg"), 5).collect()} == {0, 1}
