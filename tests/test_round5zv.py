"""Round-5 part-zv twins: impact-budget evaluation and two-stage LM."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.accumulators import impact_budget_topk
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.similarities import two_stage_lm_scored


def _engine(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


CORPUS = [
    "alpha alpha alpha pad",
    "alpha beta pad x",
    "beta beta pad y",
    "alpha pad z w",
    "beta pad q r",
    "alpha beta beta pad",
]


# ------------------------------------------------------------ impact budget
def test_budget_large_enough_is_exact(spark):
    _, s = _engine(spark, CORPUS)
    rows = impact_budget_topk(s, ["alpha", "beta"], budget=1000, k=4).collect()
    assert all(r["exact_overlap"] == 4 for r in rows)


def test_budget_one_takes_single_best_posting(spark):
    _, s = _engine(spark, CORPUS)
    rows = impact_budget_topk(s, ["alpha", "beta"], budget=1, k=10).collect()
    assert len(rows) == 1
    # the single highest-impact posting: alpha tf=3 in doc 0
    assert rows[0]["doc_id"] == 0


def test_budget_page_scores_are_prefix_sums(spark):
    _, s = _engine(spark, CORPUS)
    full = {
        r["doc_id"]: r["score_q"]
        for r in impact_budget_topk(s, ["alpha", "beta"], budget=1000, k=10).collect()
    }
    partial = impact_budget_topk(s, ["alpha", "beta"], budget=3, k=10).collect()
    # budgeted scores never exceed the full scores
    for r in partial:
        assert r["score_q"] <= full[r["doc_id"]]


def test_budget_validates_inputs(spark):
    _, s = _engine(spark, CORPUS)
    with pytest.raises(ValueError):
        impact_budget_topk(s, [], budget=10)
    with pytest.raises(ValueError):
        impact_budget_topk(s, ["x"], budget=0)


# ------------------------------------------------------------- two-stage lm
def _q4(df):
    return {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q")
        ).collect()
    }


def test_two_stage_hand_computed(spark):
    idx, _ = _engine(spark, ["probe probe x y", "probe z w v"])
    got = _q4(two_stage_lm_scored(idx, "probe", mu=10.0, lam=0.2))
    sttf, ttf = 8.0, 3.0
    pc = ttf / sttf

    def sc(tf, dl):
        pwd = (tf + 10.0 * pc) / (dl + 10.0)
        return math.floor(math.log(0.8 * pwd + 0.2 * pc) * 1e4 + 0.5)

    assert got == {0: sc(2, 4), 1: sc(1, 4)}


def test_two_stage_limits_match_single_stages(spark):
    # lam -> 0 with mu: pure Dirichlet; mu -> 0 with lam: pure JM
    idx, _ = _engine(spark, ["probe probe x y", "probe z w v", "e1 b c d"])
    sttf = 12.0
    ttf = 3.0
    pc = ttf / sttf
    d = _q4(two_stage_lm_scored(idx, "probe", mu=100.0, lam=0.0))
    want_dir = math.floor(math.log((2 + 100.0 * pc) / (4 + 100.0)) * 1e4 + 0.5)
    assert d[0] == want_dir
    j = _q4(two_stage_lm_scored(idx, "probe", mu=0.0, lam=0.3))
    want_jm = math.floor(math.log(0.7 * (2 / 4) + 0.3 * pc) * 1e4 + 0.5)
    assert j[0] == want_jm


def test_two_stage_monotone_in_tf(spark):
    idx, _ = _engine(spark, ["probe probe probe x", "probe probe y z", "probe w v u"])
    got = _q4(two_stage_lm_scored(idx, "probe"))
    assert got[0] > got[1] > got[2]
