"""SemDeDup invariants (functions/semdedup.py, arXiv:2303.09540)."""

import pytest
from pyspark.sql import SparkSession

from lucenenet_spark.functions.semdedup import (
    semdedup,
    semdedup_assign,
    semdedup_removed,
)

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s


def test_threshold_monotone_and_cluster_min_survives(spark):
    emb = spark.read.parquet(SF)
    s35 = {r["vec_id"] for r in semdedup(emb, 0.35).collect()}
    s40 = {r["vec_id"] for r in semdedup(emb, 0.40).collect()}
    # stricter duplicate test -> fewer removals -> survivor superset
    assert s35 <= s40
    assert len(s35) < emb.count()  # the gate threshold actually removes docs

    # the keep-order minimum of every cluster can never be beaten
    from lucenenet_spark.functions.similarity import trained_ivf_centroids

    assigned = semdedup_assign(emb, trained_ivf_centroids(16, 7)).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r["cid"], []).append((r["csim_q"], r["vec_id"]))
    for cid, members in by_cluster.items():
        assert min(members)[1] in s35


def test_cluster_size_cap_disables_pairing(spark):
    emb = spark.read.parquet(SF)
    surv = semdedup(emb, 0.35, max_cluster_size=1)
    # every real cluster exceeds the cap -> conservative keep-all
    assert surv.count() == emb.count()


def test_exact_duplicates_keep_exactly_one(spark):
    # two identical vectors in one cell, a third off on its own
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    surv = semdedup(emb, 0.9, centroids=cents)
    kept = sorted(r["vec_id"] for r in surv.collect())
    # identical pair: equal csim_q, tie to smaller vec_id -> 0 survives
    assert kept == [0, 2]


def test_removed_requires_within_cluster_pair(spark):
    # high-cosine pair split across DIFFERENT cells is NOT a duplicate
    rows = [
        (0, [1.0, 0.05]),
        (1, [0.05, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    assigned = semdedup_assign(emb, cents)
    assert {r["cid"] for r in assigned.collect()} == {0, 1}
    assert semdedup_removed(assigned, threshold=0.05).count() == 0
