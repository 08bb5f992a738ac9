"""Round-5 part-zc twins: JL projection and CombMNZ fusion."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.similarity import (
    jl_distance_audit,
    jl_project_q,
    jl_signs,
)
from lucenenet_spark.search.hybrid import combmnz_fusion


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


# -------------------------------------------------------------------- JL
def test_jl_projection_matches_python_replica(spark):
    vecs = [
        [0.5, -1.25, 2.0, 0.125],
        [1.0, 1.0, -1.0, 0.25],
        [0.0, 3.5, -0.75, -2.0],
    ]
    d_out = 3
    signs = {(i, j): s for i, j, s in jl_signs(4, d_out)}
    got = {
        (r["vec_id"], r["j"]): r["yq"]
        for r in jl_project_q(_emb_df(spark, vecs), d_out=d_out).collect()
    }
    for vid, v in enumerate(vecs):
        xq = [math.floor(x * 1024.0 + 0.5) for x in v]
        for j in range(d_out):
            expect = sum(xq[i] * signs[(i, j)] for i in range(4))
            assert got[(vid, j)] == expect


def test_jl_audit_identical_vectors_distance_zero(spark):
    v = [1.0] * 8
    rows = jl_distance_audit(
        _emb_df(spark, [v, v, [2.0] * 8]), d_out=4, n_pairs=2
    ).collect()
    byb = {r["vec_b"]: r for r in rows}
    assert byb[1]["d2_orig"] == 0 and byb[1]["d2_proj"] == 0
    assert byb[2]["d2_orig"] > 0


def test_jl_preserves_distances_on_real_shapes(spark):
    import random

    rng = random.Random(7)
    vecs = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(11)]
    rows = jl_distance_audit(_emb_df(spark, vecs), d_out=16, n_pairs=10).collect()
    ratios = [r["ratio_q4"] / 1e4 for r in rows]
    # JL with d_out=16: distortion well within [0.4, 1.6] whp; the mean
    # ratio should be near 1
    assert all(0.4 < r < 1.6 for r in ratios)
    assert 0.75 < sum(ratios) / len(ratios) < 1.25


# --------------------------------------------------------------- CombMNZ
def _ranked(spark, triples):
    return spark.createDataFrame(
        triples, "doc_id long, rank long, score_q long"
    )


def test_combmnz_overlap_doubles_and_normalizes(spark):
    a = _ranked(spark, [(1, 1, 100), (2, 2, 50), (3, 3, 0)])
    b = _ranked(spark, [(2, 1, 900), (4, 2, 400)])
    rows = {r["doc_id"]: r for r in combmnz_fusion(a, b, k=10).collect()}
    # doc2: n_a = 0.5, n_b = 1.0, systems 2 -> 2 * 1.5 = 3.0
    assert rows[2]["n_systems"] == 2
    assert rows[2]["fused_q"] == 3_000_000
    # doc1: only A, n_a = 1.0 -> 1.0; doc4: only B, n_b = 0 (min of B's
    # two scores) -> 0
    assert rows[1]["fused_q"] == 1_000_000 and rows[1]["n_systems"] == 1
    assert rows[4]["fused_q"] == 0
    assert rows[3]["fused_q"] == 0  # min of A normalizes to 0
    # ranking: doc2 first
    assert min(rows.values(), key=lambda r: r["rank"])["doc_id"] == 2


def test_combmnz_degenerate_single_score_system(spark):
    a = _ranked(spark, [(7, 1, 123)])
    b = _ranked(spark, [(7, 1, 9), (8, 2, 9)])
    rows = {r["doc_id"]: r for r in combmnz_fusion(a, b, k=10).collect()}
    # A has one doc -> normalized 1.0; B's scores tie -> all 1.0
    assert rows[7]["fused_q"] == 2 * 2_000_000  # 2 systems * (1 + 1)
    assert rows[8]["fused_q"] == 1_000_000


def test_combmnz_respects_k(spark):
    a = _ranked(spark, [(i, i, 100 - i) for i in range(1, 30)])
    b = _ranked(spark, [(100 + i, i, 50 - i) for i in range(1, 30)])
    out = combmnz_fusion(a, b, k=5).collect()
    assert len(out) == 10  # 5 from each side, no overlap
