"""Round-5 part-zzg twins: blended SynonymQuery and CoveringQuery."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.covering import covering_scored
from lucenenet_spark.search.queries import BooleanQuery, Occur, SynonymQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

K1, B = 1.2, 0.75


def _searcher(spark, texts, mode="double"):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return IndexSearcher(build_index(docs, text_col="text", id_col="doc_id"), mode=mode)


def _bm25(n, df, tf, dl, avgdl):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (K1 + 1) * tf / (tf + K1 * (1 - B + B * dl / avgdl))


def test_synonym_blended_replica(spark):
    texts = [
        "car auto road",          # both members: tf 2 blended
        "car car trip",           # one member twice
        "auto x y z",             # other member once
        "road trip x",            # no member
    ]
    s = _searcher(spark, texts)
    got = {r["doc_id"]: r["score"] for r in s.scored(SynonymQuery(terms=("car", "auto"))).collect()}
    dls = [3, 3, 4, 3]
    avgdl = sum(dls) / 4
    df_blend = max(2, 2)  # car in docs 0,1; auto in docs 0,2
    want = {
        0: _bm25(4, df_blend, 2, dls[0], avgdl),
        1: _bm25(4, df_blend, 2, dls[1], avgdl),
        2: _bm25(4, df_blend, 1, dls[2], avgdl),
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_synonym_uses_max_df_not_sum(spark):
    # df(car)=3, df(auto)=1 -> blended df must be 3 (max), not 4 (sum):
    # a doc containing only 'auto' scores with car's idf.
    texts = ["car q", "car q", "car q", "auto q"]
    s = _searcher(spark, texts)
    got = {r["doc_id"]: r["score"] for r in s.scored(SynonymQuery(terms=("car", "auto"))).collect()}
    want = _bm25(4, 3, 1, 2, 2.0)
    assert got[3] == pytest.approx(want, rel=1e-12)
    # and all four docs score identically (same tf=1, same dl, same blended df)
    assert len({round(v, 12) for v in got.values()}) == 1


def test_synonym_score_below_or_expansion(spark):
    # OR of the two TermQueries double-counts idf on a doc holding both
    # members; the blended query must score such a doc strictly lower.
    texts = ["car auto", "car x", "auto y", "z z"]
    s = _searcher(spark, texts)
    syn = {r["doc_id"]: r["score"] for r in s.scored(SynonymQuery(terms=("car", "auto"))).collect()}
    orq = BooleanQuery.of((TermQuery("car"), Occur.SHOULD), (TermQuery("auto"), Occur.SHOULD))
    orx = {r["doc_id"]: r["score"] for r in s.scored(orq).collect()}
    assert syn[0] < orx[0]


def test_synonym_validation(spark):
    s = _searcher(spark, ["x y"])
    with pytest.raises(ValueError):
        s.scored(SynonymQuery(terms=()))
    with pytest.raises(ValueError):
        s.scored(SynonymQuery(terms=("x", "x")))


def test_covering_threshold_and_sum(spark):
    texts = [
        "red green blue",   # matches 3 clauses
        "red green x",      # matches 2
        "red x y",          # matches 1
        "x y z",            # matches 0
    ]
    s = _searcher(spark, texts)
    qs = [TermQuery(t) for t in ("red", "green", "blue")]
    # threshold 2 for even doc_ids, 3 for odd
    thr = lambda doc: F.when(doc % 2 == 0, F.lit(2)).otherwise(F.lit(3))  # noqa: E731
    rows = {r["doc_id"]: r for r in covering_scored(s, qs, thr).collect()}
    assert set(rows) == {0}  # doc0: 3>=2 ok; doc1: 2<3 out; doc2: 1<2 out
    per = {
        t: {r["doc_id"]: r["score"] for r in s.scored(TermQuery(t)).collect()}
        for t in ("red", "green", "blue")
    }
    want0 = sum(per[t].get(0, 0.0) for t in per)
    assert rows[0]["n_matched"] == 3
    assert rows[0]["score"] == pytest.approx(want0, rel=1e-12)


def test_covering_constant_threshold_equals_msm_docset(spark):
    texts = ["a1 a2 a3", "a1 a2 x", "a1 x y", "x y z", "a2 a3 q"]
    s = _searcher(spark, texts)
    qs = [TermQuery(t) for t in ("a1", "a2", "a3")]
    cov = {r["doc_id"] for r in covering_scored(s, qs, F.lit(2)).collect()}
    msm = BooleanQuery.of(
        *[(q, Occur.SHOULD) for q in qs], minimum_should_match=2
    )
    want = {r["doc_id"] for r in s.docset(msm).collect()}
    assert cov == want


def test_covering_validation(spark):
    s = _searcher(spark, ["x y"])
    with pytest.raises(ValueError):
        covering_scored(s, [], F.lit(1))
