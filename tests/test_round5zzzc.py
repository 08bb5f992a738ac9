"""Round-5 part-zzzc twins: paired randomization significance test and
IPS counterfactual ranker evaluation."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import ips_eval, map_mrr_at_k, randomization_test
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _searchers(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return IndexSearcher(idx, mode="double"), IndexSearcher(
        idx, mode="double", similarity="classic"
    )


_TEXTS = [
    "cat cat likes fish a lot",
    "cat sleeps on the warm mat today",
    "cat cat cat everywhere in the house",
    "dog dog chases the cat around",
    "dog barks at the mail truck",
    "fish fish swim under the dock",
    "fish and dog and cat together dog dog",
    "the mat is warm and the dock is wet",
]
_TERMS = ["cat", "dog", "fish"]
_SCALE = 2520
_K = 10


def _sign(trial: int, term: str) -> int:
    h = hashlib.md5(f"{trial}:{term}".encode()).hexdigest()
    return 1 if int(h[0], 16) < 8 else -1


def _apq9(num: int, r: int) -> int:
    if r <= 0:
        return 0
    return (2 * num * 10**9 + _SCALE * r) // (2 * _SCALE * r)


def test_randomization_replica(spark):
    bm25, classic = _searchers(spark, _TEXTS)
    diffs = []
    for t in sorted(_TERMS):
        a = map_mrr_at_k(bm25, t, k=_K, min_tf=2).collect()[0]
        b = map_mrr_at_k(classic, t, k=_K, min_tf=2).collect()[0]
        diffs.append((t, _apq9(a["ap_num_s"], a["r_total"]) - _apq9(b["ap_num_s"], b["r_total"])))
    d_obs = sum(d for _, d in diffs)
    n_trials = 64
    n_ext = sum(
        1
        for tr in range(n_trials)
        if abs(sum(_sign(tr, t) * d for t, d in diffs)) >= abs(d_obs)
    )
    row = randomization_test(bm25, classic, _TERMS, k=_K, min_tf=2, n_trials=n_trials).collect()[0]
    assert (row["n_queries"], row["n_trials"]) == (3, 64)
    assert row["d_obs_q9"] == d_obs
    assert row["n_extreme"] == n_ext
    assert row["p_ppm"] == n_ext * 10**6 // n_trials


def test_randomization_identical_systems_p_is_one(spark):
    bm25, _ = _searchers(spark, _TEXTS)
    row = randomization_test(bm25, bm25, _TERMS, k=_K, n_trials=32).collect()[0]
    # d = 0 per query -> every sign flip ties the observed |0|
    assert row["d_obs_q9"] == 0
    assert row["n_extreme"] == 32
    assert row["p_ppm"] == 10**6


def test_randomization_rejects_dup_terms(spark):
    bm25, classic = _searchers(spark, _TEXTS)
    with pytest.raises(ValueError):
        randomization_test(bm25, classic, ["cat", "cat"])


# ----------------------------------------------------------------------
# IPS
# ----------------------------------------------------------------------


def _ranked_ids(searcher, term, k=_K):
    scored = searcher.scored(TermQuery(term)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("q"),
    )
    rows = (
        scored.withColumn("r", F.row_number().over(Window.orderBy(F.desc("q"), F.asc("doc_id"))))
        .filter(F.col("r") <= k)
        .collect()
    )
    return {r["doc_id"]: r["r"] for r in rows}


def _relevant(searcher, term, min_tf=2):
    idx = searcher.index
    return {
        r["doc_id"]
        for r in idx.postings.filter(
            (F.col("field") == idx.default_field)
            & (F.col("term") == term)
            & (F.col("tf") >= min_tf)
        ).collect()
    }


def _py_ips(rank_log, rank_tgt, rel):
    n_clicks = sum_w = ips = 0
    for d, rl in rank_log.items():
        if d not in rel or not (rl <= 3 or d % 2 == 0):
            continue
        w = 1 if rl <= 3 else 2
        n_clicks += 1
        sum_w += w
        rt = rank_tgt.get(d)
        if rt is not None:
            ips += w * (_SCALE // rt)
    return n_clicks, sum_w, ips


def test_ips_replica(spark):
    bm25, classic = _searchers(spark, _TEXTS)
    rows = {r["term"]: r for r in ips_eval(bm25, classic, _TERMS).collect()}
    assert set(rows) == set(_TERMS)
    for t in _TERMS:
        want = _py_ips(_ranked_ids(bm25, t), _ranked_ids(classic, t), _relevant(bm25, t))
        r = rows[t]
        assert (r["n_clicks"], r["sum_w"], r["ips_num_s"]) == want, t
        assert r["scale_s"] == _SCALE


def test_ips_self_evaluation_matches_logged_utility(spark):
    """Evaluating the LOGGING ranker against its own clicks: every
    clicked doc is in the target top-k at the same rank, so
    ips_num_s == sum(w * S/rank_log) exactly."""
    bm25, _ = _searchers(spark, _TEXTS)
    rows = {r["term"]: r for r in ips_eval(bm25, bm25, _TERMS).collect()}
    for t in _TERMS:
        rl = _ranked_ids(bm25, t)
        rel = _relevant(bm25, t)
        want = sum(
            (1 if r <= 3 else 2) * (_SCALE // r)
            for d, r in rl.items()
            if d in rel and (r <= 3 or d % 2 == 0)
        )
        assert rows[t]["ips_num_s"] == want, t


def test_ips_missing_target_doc_contributes_zero(spark):
    # target ranker sees a disjoint vocabulary query -> all rank_tgt null
    bm25, classic = _searchers(spark, _TEXTS)
    rows = ips_eval(bm25, classic, ["mat"]).collect()
    # 'mat' docs: rel needs tf>=2 -> none (mat appears once per doc),
    # so zero clicks and zero mass
    assert rows[0]["n_clicks"] == 0 and rows[0]["ips_num_s"] == 0
