"""Round-5 part-zk twins: exact-integer MAP/MRR/P@k and CORI shard
selection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import map_mrr_at_k
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import cori_shard_ranking

SCALE10 = 2520  # lcm(1..10)


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


# ----------------------------------------------------------------- map/mrr
def test_map_mrr_single_relevant_at_rank_one(spark):
    _, s = _engine(spark, [(0, "hit hit other"), (1, "plain words only"), (2, "more plain words")])
    row = map_mrr_at_k(s, "hit", k=10).collect()[0]
    assert row["r_total"] == 1 and row["scale_s"] == SCALE10
    assert row["p_at_k"] == 1
    assert row["rr_num_s"] == SCALE10      # first rel at rank 1
    assert row["ap_num_s"] == SCALE10      # AP = 1.0


def test_map_mrr_tf1_is_judged_nonrelevant(spark):
    # tf=1 docs are judged but NOT relevant (min_tf=2): they occupy ranks
    # without contributing, pushing AP below 1
    _, s = _engine(spark, [(0, "hit hit"), (1, "hit filler"), (2, "hit hit filler pad")])
    row = map_mrr_at_k(s, "hit", k=10).collect()[0]
    assert row["r_total"] == 2
    assert row["p_at_k"] == 2
    # replica from the actual ranking
    run = (
        s.scored(TermQuery("hit"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .collect()
    )
    rel = {0, 2}
    relcnt, ap, rr = 0, 0, 0
    for i, r in enumerate(run, start=1):
        if r["doc_id"] in rel:
            relcnt += 1
            ap += relcnt * SCALE10 // i
            if rr == 0:
                rr = SCALE10 // i
    assert row["ap_num_s"] == ap and row["rr_num_s"] == rr


def test_map_mrr_python_replica_on_larger_corpus(spark):
    rows = []
    for i in range(30):
        words = ["w%d" % j for j in range(i % 5 + 1)]
        if i % 3 == 0:
            words += ["probe"] * (i % 4 + 1)   # tf 1..4
        rows.append((i, " ".join(words)))
    _, s = _engine(spark, rows)
    row = map_mrr_at_k(s, "probe", k=10, min_tf=2).collect()[0]
    run = (
        s.scored(TermQuery("probe"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    rel = {i for i in range(30) if i % 3 == 0 and i % 4 + 1 >= 2}
    relcnt = ap = rr = p = 0
    for i, r in enumerate(run, start=1):
        if r["doc_id"] in rel:
            relcnt += 1
            p += 1
            ap += relcnt * SCALE10 // i
            if rr == 0:
                rr = SCALE10 // i
    assert row["r_total"] == len(rel)
    assert (row["p_at_k"], row["rr_num_s"], row["ap_num_s"]) == (p, rr, ap)


def test_map_mrr_no_relevant_in_pool(spark):
    # term present only at tf=1 -> judged pool has zero relevant docs
    _, s = _engine(spark, [(0, "hit alone"), (1, "other words")])
    row = map_mrr_at_k(s, "hit", k=10).collect()[0]
    assert row["r_total"] == 0
    assert row["p_at_k"] == 0 and row["rr_num_s"] == 0 and row["ap_num_s"] == 0


def test_map_mrr_scale_is_lcm(spark):
    _, s = _engine(spark, [(0, "hit hit")])
    assert map_mrr_at_k(s, "hit", k=7).collect()[0]["scale_s"] == 420  # lcm(1..7)


# -------------------------------------------------------------------- cori
def test_cori_shard_with_all_hits_wins(spark):
    rows = []
    for i in range(12):
        base = ["common%d" % (i % 3), "pad"]
        if i % 3 == 0:   # shard 0 of n_shards=3 holds every 'zebra'
            base += ["zebra", "zebra"]
        rows.append((i, " ".join(base)))
    idx, _ = _engine(spark, rows)
    out = cori_shard_ranking(idx, ["zebra"], n_shards=3).collect()
    assert [r["shard_id"] for r in out if r["rank"] == 1] == [0]
    assert len(out) == 3 and sorted(r["rank"] for r in out) == [1, 2, 3]


def test_cori_absent_term_hits_belief_floor(spark):
    idx, _ = _engine(spark, [(0, "alpha beta"), (1, "alpha gamma")])
    out = {r["shard_id"]: r for r in cori_shard_ranking(idx, ["nosuchterm"], n_shards=2).collect()}
    # df=0 everywhere -> belief = b = 0.4 exactly -> q6 = 400000
    assert out[0]["belief_sum_q6"] == 400000
    assert out[1]["belief_sum_q6"] == 400000


def test_cori_multi_term_sums_quantized_beliefs(spark):
    rows = [(0, "apple apple pad"), (1, "banana pad pad"), (2, "apple banana"), (3, "pad pad pad")]
    idx, _ = _engine(spark, rows)
    both = {r["shard_id"]: r["belief_sum_q6"]
            for r in cori_shard_ranking(idx, ["apple", "banana"], n_shards=2).collect()}
    a = {r["shard_id"]: r["belief_sum_q6"]
         for r in cori_shard_ranking(idx, ["apple"], n_shards=2).collect()}
    b = {r["shard_id"]: r["belief_sum_q6"]
         for r in cori_shard_ranking(idx, ["banana"], n_shards=2).collect()}
    for s_ in (0, 1):
        assert both[s_] == a[s_] + b[s_]


def test_cori_hand_computed_single_shard_case(spark):
    # one shard: cf=1, cw=acw -> T = df/(df+200), I = ln(1.5)/ln(2)
    idx, _ = _engine(spark, [(0, "x y z x")])
    row = cori_shard_ranking(idx, ["x"], n_shards=1).collect()[0]
    t = 1.0 / (1.0 + 50.0 + 150.0)
    i = math.log(1.5 / 1.0) / math.log(2.0)
    want = math.floor((0.4 + 0.6 * t * i) * 1e6 + 0.5)
    assert row["belief_sum_q6"] == want


def test_cori_validates_inputs(spark):
    idx, _ = _engine(spark, [(0, "x")])
    with pytest.raises(ValueError):
        cori_shard_ranking(idx, [], n_shards=2)
    with pytest.raises(ValueError):
        cori_shard_ranking(idx, ["x"], n_shards=0)
