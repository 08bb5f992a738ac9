"""Round-5 part-zzh twins: FeatureField transforms and the
RoaringDocIdSet layout audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.index.layout_stats import roaring_docidset_audit
from lucenenet_spark.search.features import (
    feature_boosted,
    log_feature,
    saturation,
    sigmoid,
)
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _searcher(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return IndexSearcher(build_index(docs, text_col="text", id_col="doc_id"), mode="double")


def test_transforms_replica(spark):
    df = spark.range(1).select(F.lit(5.0).alias("v"))
    row = df.select(
        saturation(F.col("v"), 10.0).alias("s"),
        log_feature(F.col("v"), 1.0).alias("l"),
        sigmoid(F.col("v"), 5.0, 2.0).alias("g"),
    ).collect()[0]
    assert row["s"] == pytest.approx(5.0 / 15.0, rel=1e-12)
    assert row["l"] == pytest.approx(math.log(6.0), rel=1e-12)
    assert row["g"] == pytest.approx(25.0 / 50.0, rel=1e-12)


def test_transforms_bounded_and_monotone(spark):
    vals = [0.0, 1.0, 10.0, 100.0, 1e9]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select("v", saturation(F.col("v"), 10.0).alias("s")).orderBy("v").collect()
    svals = [r["s"] for r in rows]
    assert all(0.0 <= s < 1.0 for s in svals)
    assert svals == sorted(svals)


def test_feature_boosted_blend(spark):
    texts = ["hit a b", "hit c", "miss d"]
    s = _searcher(spark, texts)
    feats = spark.createDataFrame([(0, 300.0), (1, 0.0)], "doc_id long, f double")
    base = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("hit")).collect()}
    out = {
        r["doc_id"]: r["score"]
        for r in feature_boosted(
            s, TermQuery("hit"), feats, "f", lambda v: saturation(v, 300.0), weight=2.0
        ).collect()
    }
    assert set(out) == {0, 1}  # feature never creates matches
    assert out[0] == pytest.approx(base[0] + 2.0 * 0.5, rel=1e-12)
    assert out[1] == pytest.approx(base[1], rel=1e-12)  # v=0 -> sat 0


def test_feature_missing_doc_is_zero(spark):
    texts = ["hit a", "hit b"]
    s = _searcher(spark, texts)
    feats = spark.createDataFrame([(0, 50.0)], "doc_id long, f double")
    out = {
        r["doc_id"]: r["score"]
        for r in feature_boosted(
            s, TermQuery("hit"), feats, "f", lambda v: saturation(v, 50.0), weight=4.0
        ).collect()
    }
    base = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("hit")).collect()}
    assert out[1] == pytest.approx(base[1], rel=1e-12)
    assert out[0] == pytest.approx(base[0] + 4.0 * 0.5, rel=1e-12)


def test_feature_validation(spark):
    with pytest.raises(ValueError):
        saturation(F.lit(1.0), 0.0)
    with pytest.raises(ValueError):
        log_feature(F.lit(1.0), 0.5)
    with pytest.raises(ValueError):
        sigmoid(F.lit(1.0), -1.0, 2.0)


def test_roaring_encodings_exact(spark):
    # block 0: 2 docs -> array (4 bytes); block 1: 62 of 64 -> inverse
    # (4 bytes); block 2: 30 docs -> bitmap (8 bytes)
    ids = [0, 5] + list(range(64, 128))[:62] + [128 + 2 * i for i in range(30)]
    ds = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r["block_id"]: r for r in roaring_docidset_audit(ds, block_bits=6).collect()}
    assert (rows[0]["encoding"], rows[0]["card"], rows[0]["n_bytes"]) == ("array", 2, 4)
    assert (rows[1]["encoding"], rows[1]["card"], rows[1]["n_bytes"]) == ("inverse", 62, 4)
    assert (rows[2]["encoding"], rows[2]["card"], rows[2]["n_bytes"]) == ("bitmap", 30, 8)


def test_roaring_empty_blocks_absent_and_validation(spark):
    ds = spark.createDataFrame([(1000,)], "doc_id long")
    rows = roaring_docidset_audit(ds, block_bits=6).collect()
    assert len(rows) == 1 and rows[0]["block_id"] == 1000 // 64
    with pytest.raises(ValueError):
        roaring_docidset_audit(ds, block_bits=3)
