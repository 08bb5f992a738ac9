"""Round-5q tests: DSIR importance resampling (Xie et al. NeurIPS 2023
shape) — weight direction, Gumbel determinism, model boundedness, and the
no-cartesian/broadcast plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.dsir import (
    dsir_gumbel_topk,
    dsir_log_weights,
    dsir_select,
    hashed_gram_counts,
)

# a tiny bilingual corpus: target-like docs share the "data engine" topic
# vocabulary; off-target docs use a disjoint vocabulary
_TARGETY = [
    (0, "data engine builds the index", "en"),
    (1, "engine scans the data index", "en"),
    (2, "index data engine merge scan", "en"),
]
_OFFTARGET = [
    (10, "zvq wxk yyt plo qrs mnb", "xx"),
    (11, "plo qrs zvq wxk mnb yyt", "xx"),
]
_MIXED = [(20, "data engine zvq wxk index", "mx")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _TARGETY + _OFFTARGET + _MIXED, ["doc_id", "text", "lang"]
    )


def _weights(corpus):
    target = corpus.filter(F.col("lang") == "en")
    rows = dsir_log_weights(corpus, target, n_buckets=1024).collect()
    return {r["doc_id"]: r["logw"] for r in rows}


def test_weights_rank_target_like_docs_above_off_target(corpus):
    w = _weights(corpus)
    assert set(w) == {0, 1, 2, 10, 11, 20}
    # every target-vocabulary doc outweighs every off-target doc, with the
    # mixed doc strictly between the two groups
    assert min(w[0], w[1], w[2]) > w[20] > max(w[10], w[11])


def test_gumbel_topk_is_deterministic_and_seed_sensitive(corpus):
    target = corpus.filter(F.col("lang") == "en")
    a = dsir_gumbel_topk(corpus, target, k=3, seed="s1", n_buckets=1024).collect()
    b = dsir_gumbel_topk(corpus, target, k=3, seed="s1", n_buckets=1024).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    c = dsir_gumbel_topk(corpus, target, k=3, seed="s2", n_buckets=1024).collect()
    # same weights, different perturbation keys
    assert {r["doc_id"]: r["logw_q"] for r in a}.keys() == {
        r["doc_id"]: r["logw_q"] for r in a
    }.keys()
    assert [r["gumbel_q"] for r in a] != [r["gumbel_q"] for r in c]


def test_select_returns_k_raw_documents(corpus):
    target = corpus.filter(F.col("lang") == "en")
    out = dsir_select(corpus, target, k=4, n_buckets=1024)
    assert out.columns == corpus.columns
    assert out.count() == 4


def test_feature_table_is_bounded_by_n_buckets(corpus):
    counts = hashed_gram_counts(corpus, n_buckets=16)
    distinct = counts.select("bucket").distinct().collect()
    assert len(distinct) <= 16
    assert all(0 <= r["bucket"] < 16 for r in distinct)


def test_unigram_only_mode_differs_from_bigram_mode(corpus):
    target = corpus.filter(F.col("lang") == "en")
    w_uni = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(
            corpus, target, n_buckets=1024, bigrams=False
        ).collect()
    }
    w_big = _weights(corpus)
    assert w_uni != w_big
    # the direction of the signal is mode-invariant
    assert min(w_uni[0], w_uni[1], w_uni[2]) > max(w_uni[10], w_uni[11])


def test_plan_has_no_cartesian_and_broadcasts_the_models(corpus):
    target = corpus.filter(F.col("lang") == "en")
    plan = dsir_log_weights(corpus, target, n_buckets=1024)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
