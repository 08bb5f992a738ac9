"""Round-5 part-zzj twins: GMAP and Q-measure."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import gmap_eval, map_mrr_at_k, q_measure
from lucenenet_spark.search.searcher import IndexSearcher


def _searcher(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return IndexSearcher(build_index(docs, text_col="text", id_col="doc_id"), mode="double")


def _q9(x):
    return math.floor(x * 1e9 + 0.5)


def test_gmap_replica_from_per_query_aps(spark):
    texts = [
        "cat cat q1", "cat q2", "cat cat q3",       # cat: rel = tf>=2
        "dog dog w1", "dog w2",
        "cat dog e1",
    ]
    s = _searcher(spark, texts)
    terms = ["cat", "dog"]
    k = 10
    scale = 2520
    aps = []
    for t in sorted(terms):
        r = map_mrr_at_k(s, t, k=k, min_tf=2).collect()[0]
        aps.append(r["ap_num_s"] / (scale * r["r_total"]))
    row = gmap_eval(s, terms, k=k, min_tf=2).collect()[0]
    want_map = _q9(((aps[0] + aps[1])) / 2.0)
    want_gmap = _q9(math.exp((math.log(aps[0]) + math.log(aps[1])) / 2.0))
    assert row["n_queries"] == 2
    assert row["map_q9"] == want_map
    assert row["gmap_q9"] == want_gmap


def test_gmap_zero_ap_query_zeroes_gmap_not_map(spark):
    # 'rare' never reaches tf>=2 -> R=0... use a term whose rel docs
    # exist but never enter the run? Simpler: term with rel docs ranked
    # in, and a second term 'solo' that appears once per doc (tf<2
    # everywhere) -> r_total=0 -> AP num 0.
    texts = ["cat cat a", "cat b", "solo c", "solo d"]
    s = _searcher(spark, texts)
    row = gmap_eval(s, ["cat", "solo"], k=5, min_tf=2).collect()[0]
    assert row["gmap_q9"] == 0
    assert row["map_q9"] > 0


def test_gmap_order_insensitive_in_terms_arg(spark):
    texts = ["cat cat x", "dog dog y", "cat dog z"]
    s = _searcher(spark, texts)
    a = gmap_eval(s, ["cat", "dog"], k=5).collect()[0]
    b = gmap_eval(s, ["dog", "cat"], k=5).collect()[0]
    assert a.asDict() == b.asDict()


def test_gmap_validation(spark):
    s = _searcher(spark, ["x y"])
    with pytest.raises(ValueError):
        gmap_eval(s, [])
    with pytest.raises(ValueError):
        gmap_eval(s, ["x", "x"])


def test_q_measure_replica(spark):
    # ranks are by BM25 then doc_id; craft relevances via tf
    texts = ["hit hit a", "hit b", "hit hit c", "miss d", "hit hit hit e"]
    s = _searcher(spark, texts)
    rows = sorted(q_measure(s, "hit", k=5, min_tf=2).collect(), key=lambda r: r["rank"])
    r_total = 3  # docs 0, 2, 4
    assert all(r["r_total"] == r_total for r in rows)
    assert len(rows) == r_total  # all relevant docs retrieved in top-5
    for r in rows:
        want = _q9(2 * r["relcnt"] / (min(r["rank"], r_total) + r["rank"]))
        assert r["br_q9"] == want
    # perfect prefix: if the top ranks are all relevant, BR there is 1.0
    first = rows[0]
    if first["rank"] == 1:
        assert first["br_q9"] == 10**9


def test_q_measure_below_R_still_counts(spark):
    # one relevant doc ranked below R: BR uses min(rank, R) in the ideal
    texts = ["hit hit hit a b c", "hit x", "hit hit y z w v u t s r q p"]
    s = _searcher(spark, texts)
    rows = {r["rank"]: r for r in q_measure(s, "hit", k=5, min_tf=2).collect()}
    r_total = 2
    for rank, r in rows.items():
        assert r["br_q9"] == _q9(2 * r["relcnt"] / (min(rank, r_total) + rank))
    assert any(rank > r_total for rank in rows)  # the deep hit exists
