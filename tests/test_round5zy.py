"""Round-5 part-zy twins: partitioning cost model and static cache
curve."""

from __future__ import annotations

import hashlib
import math

import pytest

from lucenenet_spark.functions.querylog import static_cache_hit_rate
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.sharded import partitioning_cost_model


def _idx(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def _shard(term, s):
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % s


# ----------------------------------------------------------- partitioning
def test_partitioning_doc_side_is_closed_form(spark):
    idx = _idx(spark, ["alpha beta", "alpha gamma", "beta gamma"])
    rows = {r["strategy"]: r for r in
            partitioning_cost_model(idx, ["alpha", "beta"], n_shards=4, k=10).collect()}
    assert rows["doc_partitioned"]["query_messages"] == 4
    assert rows["doc_partitioned"]["network_rows"] == 40


def test_partitioning_term_side_python_replica(spark):
    texts = ["alpha beta gamma"] * 5 + ["alpha x y"] * 3 + ["beta z"]
    idx = _idx(spark, texts)
    terms = ["alpha", "beta", "gamma"]
    dfs = {"alpha": 8, "beta": 6, "gamma": 5}
    shards = {t: _shard(t, 4) for t in terms}
    coord = shards[min(terms, key=lambda t: (dfs[t], t))]
    want_rows = sum(dfs[t] for t in terms if shards[t] != coord)
    want_msgs = len(set(shards.values()))
    rows = {r["strategy"]: r for r in
            partitioning_cost_model(idx, terms, n_shards=4, k=10).collect()}
    tp = rows["term_partitioned"]
    assert (tp["query_messages"], tp["network_rows"]) == (want_msgs, want_rows)


def test_partitioning_single_shard_ships_nothing(spark):
    idx = _idx(spark, ["alpha beta"] * 3)
    rows = {r["strategy"]: r for r in
            partitioning_cost_model(idx, ["alpha", "beta"], n_shards=1, k=5).collect()}
    tp = rows["term_partitioned"]
    assert tp["query_messages"] == 1 and tp["network_rows"] == 0


def test_partitioning_validates_inputs(spark):
    idx = _idx(spark, ["x y"])
    with pytest.raises(ValueError):
        partitioning_cost_model(idx, [], n_shards=2)
    with pytest.raises(ValueError):
        partitioning_cost_model(idx, ["x"], n_shards=0)


# ------------------------------------------------------------ cache curve
def _events(spark, qids):
    return spark.createDataFrame(
        [(i, '{"k": %d}' % q) for i, q in enumerate(qids)],
        "event_id long, props string",
    )


def test_cache_curve_hand_computed(spark):
    # freq: q1 x5, q2 x3, q3 x2 (total 10)
    ev = _events(spark, [1] * 5 + [2] * 3 + [3] * 2)
    rows = {r["capacity"]: r for r in
            static_cache_hit_rate(ev, capacities=(1, 2, 4)).collect()}
    assert (rows[1]["hits"], rows[1]["hit_rate_q6"]) == (5, 500000)
    assert (rows[2]["hits"], rows[2]["hit_rate_q6"]) == (8, 800000)
    # capacity beyond the log: everything hits, cached capped at 3
    assert rows[4]["cached"] == 3 and rows[4]["hits"] == 10
    assert rows[4]["hit_rate_q6"] == 1000000


def test_cache_curve_is_monotone(spark):
    ev = _events(spark, [i % 7 for i in range(50)])
    rows = sorted(static_cache_hit_rate(ev).collect(), key=lambda r: r["capacity"])
    rates = [r["hit_rate_q6"] for r in rows]
    assert rates == sorted(rates)


def test_cache_curve_tie_break_by_qid(spark):
    # q5 and q9 both x2: capacity 1 must cache the smaller qid (5)
    ev = _events(spark, [5, 9, 5, 9])
    r = {x["capacity"]: x for x in static_cache_hit_rate(ev, capacities=(1,)).collect()}
    assert r[1]["hits"] == 2  # exactly one of the tied pair


def test_cache_curve_validates_capacities(spark):
    ev = _events(spark, [1, 2])
    with pytest.raises(ValueError):
        static_cache_hit_rate(ev, capacities=(0,))
