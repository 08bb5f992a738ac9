"""Round-5 part-zx twins: RBP and impact quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.docid_layout import impact_quantization_audit
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import rbp_at_k
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


# ---------------------------------------------------------------------- rbp
def test_rbp_single_relevant_at_rank_one(spark):
    _, s = _engine(spark, [(lambda: "hit hit x")(), "plain y", "plain z"])
    row = rbp_at_k(s, "hit", k=10).collect()[0]
    # weight(1) = 4^0 * 5^9
    assert row["rbp_num_s"] == 5 ** 9
    assert row["denom_s"] == 5 ** 9
    assert row["rel_in_run"] == 1


def test_rbp_replica_from_run(spark):
    texts = []
    for i in range(20):
        w = ["f%d" % j for j in range(i % 4 + 1)]
        if i % 3 == 0:
            w += ["hit"] * (i % 4 + 1)
        texts.append(" ".join(w))
    _, s = _engine(spark, texts)
    row = rbp_at_k(s, "hit", k=10, min_tf=2).collect()[0]
    run = (
        s.scored(TermQuery("hit"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    rel = {i for i in range(20) if i % 3 == 0 and i % 4 + 1 >= 2}
    want = sum(
        4 ** i * 5 ** (10 - 1 - i)
        for i, r in enumerate(run)
        if r["doc_id"] in rel
    )
    assert row["rbp_num_s"] == want
    # top-heaviness: RBP value is bounded by geometric tail
    assert 0 <= row["rbp_num_s"] <= sum(4 ** i * 5 ** (9 - i) for i in range(10))


def test_rbp_rank_one_dominates_rank_ten(spark):
    # a single rel at rank 1 is worth more than rel at ranks 2..10 combined? No —
    # but it IS worth more than one at rank 10 by (4/5)^9
    assert 4 ** 0 * 5 ** 9 > 4 ** 9 * 5 ** 0


def test_rbp_validates_params(spark):
    _, s = _engine(spark, ["x y"])
    with pytest.raises(ValueError):
        rbp_at_k(s, "x", p_num=5, p_den=4)
    with pytest.raises(ValueError):
        rbp_at_k(s, "x", k=0)


# ----------------------------------------------------------- impact levels
def test_iq_identical_impacts_tau_one(spark):
    idx, _ = _engine(spark, ["same words here"] * 6)
    row = impact_quantization_audit(idx, "same", levels=8).collect()[0]
    # all impacts equal: every pair ordered by doc tie-break in BOTH
    # orderings -> tau = 1, one distinct level
    assert row["distinct_levels"] == 1
    assert row["tau_q6"] == 1000000 and row["discordant"] == 0


def test_iq_monotone_levels_preserve_order(spark):
    # impacts strictly increase with tf at fixed dl; with enough levels
    # the quantized ordering stays perfect
    texts = ["probe " * (i + 1) + " ".join("x%d" % j for j in range(8 - i)) for i in range(4)]
    idx, _ = _engine(spark, texts)
    row = impact_quantization_audit(idx, "probe", levels=64).collect()[0]
    assert row["tau_q6"] == 1000000


def test_iq_coarse_levels_lose_fidelity(spark):
    texts = ["probe " * (i + 1) + " ".join("x%d" % j for j in range(12 - i)) for i in range(8)]
    idx, _ = _engine(spark, texts)
    fine = impact_quantization_audit(idx, "probe", levels=64).collect()[0]
    coarse = impact_quantization_audit(idx, "probe", levels=2).collect()[0]
    assert coarse["tau_q6"] <= fine["tau_q6"]
    assert coarse["distinct_levels"] <= 2


def test_iq_validates_levels(spark):
    idx, _ = _engine(spark, ["x y"])
    with pytest.raises(ValueError):
        impact_quantization_audit(idx, "x", levels=1)
