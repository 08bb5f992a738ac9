"""CustomScoreQuery provider law, DuplicateFilter keep modes, ord/rord."""

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.search.filters import duplicate_filter
from lucenenet_spark.search.valuesources import custom_scores, ord_field_source


def test_custom_scores_multiplies_all_sources(spark):
    scored = spark.createDataFrame([(0, 2.0), (1, 3.0)], "doc_id long, score double")
    vals = spark.createDataFrame(
        [(0, 0.5, 4.0), (1, 2.0, 0.5)], "doc_id long, a double, b double"
    )
    got = {r["doc_id"]: r["score"] for r in custom_scores(scored, vals, ["a", "b"]).collect()}
    assert got == {0: 4.0, 1: 3.0}
    # zero sources -> unchanged subquery score (CustomScoreProvider's
    # empty-array branch)
    got0 = {r["doc_id"]: r["score"] for r in custom_scores(scored, vals, []).collect()}
    assert got0 == {0: 2.0, 1: 3.0}


def test_duplicate_filter_first_and_last(spark):
    docs = spark.createDataFrame(
        [(0, "en"), (1, "fr"), (2, "en"), (3, None), (4, "fr"), (5, "en")],
        "doc_id long, lang string",
    )
    last = {r["doc_id"] for r in duplicate_filter(docs, "lang", keep="last").collect()}
    first = {r["doc_id"] for r in duplicate_filter(docs, "lang", keep="first").collect()}
    assert last == {5, 4}   # last en, last fr; null-key doc dropped
    assert first == {0, 1}
    with pytest.raises(ValueError):
        duplicate_filter(docs, "lang", keep="middle")


def test_ord_rord_reference_example(spark):
    # ReverseOrdFieldSource.cs doc: values apple/banana/pear ->
    # ord(apple)=1 ... rord(pear)=1
    docs = spark.createDataFrame(
        [(0, "pear"), (1, "apple"), (2, "banana"), (3, "apple"), (4, None)],
        "doc_id long, fruit string",
    )
    got = {r["doc_id"]: (r["ord"], r["rord"]) for r in ord_field_source(docs, "fruit").collect()}
    assert got == {0: (3, 1), 1: (1, 3), 2: (2, 2), 3: (1, 3)}  # null dropped


def test_ord_dictionary_is_broadcast_not_global_sort(spark):
    # the plan must not contain a global Sort of the full docset — the
    # window runs over the distinct-value dictionary only
    docs = spark.createDataFrame(
        [(i, f"v{i % 7:02d}") for i in range(500)], "doc_id long, k string"
    )
    df = ord_field_source(docs, "k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    n = {r["ord"] for r in df.collect()}
    assert n == set(range(1, 8))


def test_custom_score_parity_with_manual_multiply(spark):
    from tests.conftest import make_corpus
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher
    from lucenenet_spark.search.valuesources import linear, recip

    docs = make_corpus(60)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    chars = df.select("doc_id", F.length("text").cast("double").alias("n"))
    s = IndexSearcher(build_index(df))
    term = "the0"  # make_corpus vocabulary term; fall back if absent
    if s.count(TermQuery(term)) == 0:
        term = df.select(F.explode(F.split("text", " ")).alias("t")).groupBy(
            "t"
        ).count().orderBy(F.desc("count")).limit(1).collect()[0]["t"]
    scored = s.scored(TermQuery(term)).select("doc_id", "score")
    vals = chars.select(
        "doc_id",
        linear(F.col("n"), 0.01, 1.0).alias("v1"),
        recip(F.col("n"), 1.0, 100.0, 10.0).alias("v2"),
    )
    got = {r["doc_id"]: r["score"] for r in custom_scores(scored, vals, ["v1", "v2"]).collect()}
    base = {r["doc_id"]: r["score"] for r in scored.collect()}
    nn = {r["doc_id"]: r["n"] for r in chars.collect()}
    assert got
    for d, sc in got.items():
        want = base[d] * (0.01 * nn[d] + 1.0) * (100.0 / (nn[d] + 10.0))
        assert math.isclose(sc, want, rel_tol=1e-12)


def test_sorted_reindex_permutes_ids_and_preserves_scores(spark):
    from tests.conftest import make_corpus
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.index.sorter import sort_permutation, sorted_reindex
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = make_corpus(70)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    df = df.withColumn("klen", F.length("text").cast("long"))
    idx, sorted_docs = sorted_reindex(df, "klen")
    rows = sorted(sorted_docs.select("doc_id", "klen").collect(), key=lambda r: r["doc_id"])
    # docID order IS (klen, old_id) order: klen non-decreasing, ids dense
    assert [r["doc_id"] for r in rows] == list(range(70))
    lens = [r["klen"] for r in rows]
    assert lens == sorted(lens)
    # DocMap: bijective old->new
    perm = sort_permutation(df, "klen")
    m = {r["old_id"]: r["new_id"] for r in perm.collect()}
    assert sorted(m) == list(range(70)) and sorted(m.values()) == list(range(70))
    # BM25 invariance: same multiset of scores as the unsorted index,
    # doc-for-doc through the permutation
    term = "term7"
    base = IndexSearcher(build_index(df), mode="double")
    srt = IndexSearcher(idx, mode="double")
    if base.count(TermQuery(term)) == 0:
        term = df.select(F.explode(F.split("text", " ")).alias("t")).groupBy("t").count(
        ).orderBy(F.desc("count")).limit(1).collect()[0]["t"]
    b = {m[r["doc_id"]]: r["score"] for r in base.scored(TermQuery(term)).collect()}
    s = {r["doc_id"]: r["score"] for r in srt.scored(TermQuery(term)).collect()}
    assert b and all(math.isclose(s[d], v, rel_tol=1e-12) for d, v in b.items())
