"""Round-5 part-zzl twins: zone-map pruning audit and the Matryoshka
prefix-dimension overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.similarity import cosine_topk_arrays_q, dim_prefix_overlap
from lucenenet_spark.index.layout_stats import zonemap_prune_audit


def _events(spark, values):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "event_id long, value double"
    )


def test_zonemap_sorted_layout_prunes_more(spark):
    # values interleaved so id-order blocks all straddle the predicate,
    # while value-order concentrates matches into one block
    vals = [1, 100, 2, 101, 3, 102, 4, 103, 5, 104, 6, 105, 7, 106, 8, 107]
    ev = _events(spark, vals)
    a = zonemap_prune_audit(ev, ["event_id"], "value", 100.0, 107.0, 4, "by_id").collect()[0]
    b = zonemap_prune_audit(ev, ["value", "event_id"], "value", 100.0, 107.0, 4, "by_value").collect()[0]
    assert a["rows_matched"] == b["rows_matched"] == 8
    assert a["n_pruned"] == 0 and a["rows_scanned"] == 16
    assert b["n_pruned"] == 2 and b["rows_scanned"] == 8


def test_zonemap_exact_block_accounting(spark):
    vals = [10, 20, 30, 40, 50, 60, 70, 80, 90]  # 3 blocks of 3 + none left over? 9/4 -> 3 blocks
    ev = _events(spark, vals)
    r = zonemap_prune_audit(ev, ["event_id"], "value", 35.0, 55.0, 4, "x").collect()[0]
    # blocks: [10..40] overlaps, [50..80] overlaps, [90] pruned
    assert r["n_blocks"] == 3
    assert r["n_pruned"] == 1
    assert r["rows_scanned"] == 8
    assert r["rows_matched"] == 2  # 40, 50


def test_zonemap_validation(spark):
    ev = _events(spark, [1, 2])
    with pytest.raises(ValueError):
        zonemap_prune_audit(ev, ["event_id"], "value", 5.0, 1.0)
    with pytest.raises(ValueError):
        zonemap_prune_audit(ev, ["event_id"], "value", 1.0, 5.0, 0)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_dim_prefix_overlap_full_prefix_is_k(spark):
    vecs = [[float(i + j) for j in range(4)] for i in range(12)]
    emb = _emb(spark, vecs)
    q = vecs[0]
    r = dim_prefix_overlap(emb, q, prefix_dim=4, k=5).collect()[0]
    assert (r["k"], r["prefix_dim"], r["overlap"]) == (5, 4, 5)


def test_dim_prefix_overlap_detects_divergence(spark):
    # first dim identical everywhere; ranking on prefix 1 is pure
    # tie-break while full ranking follows the tail dims
    vecs = [[1.0, float(i % 7), float((i * 3) % 5)] for i in range(20)]
    emb = _emb(spark, vecs)
    q = [1.0, 6.0, 4.0]
    full = [r["vec_id"] for r in cosine_topk_arrays_q(emb, q, 5).collect()]
    pre = [
        r["vec_id"]
        for r in cosine_topk_arrays_q(
            emb.select("vec_id", F.slice("embedding", 1, 1).alias("embedding")),
            q[:1],
            5,
        ).collect()
    ]
    want = len(set(full) & set(pre))
    r = dim_prefix_overlap(emb, q, prefix_dim=1, k=5).collect()[0]
    assert r["overlap"] == want
    assert r["overlap"] < 5


def test_dim_prefix_validation(spark):
    emb = _emb(spark, [[1.0, 2.0]])
    with pytest.raises(ValueError):
        dim_prefix_overlap(emb, [1.0, 2.0], prefix_dim=0)
    with pytest.raises(ValueError):
        dim_prefix_overlap(emb, [1.0, 2.0], prefix_dim=3)
