"""Round-5 part-zt twins: CORI-routed federated search and Borda
fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.hybrid import borda_fuse
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import cori_routed_topk


def _engine(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


def _rk(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


# ---------------------------------------------------------------- federated
def test_federated_probe_all_equals_global(spark):
    texts = ["probe %d word fill" % i for i in range(12)]
    _, s = _engine(spark, texts)
    fed = cori_routed_topk(s, "probe", n_shards=3, n_probe=3, k=5).collect()
    # probing every shard: the page IS the global page
    assert all(r["global_overlap"] == 5 for r in fed)
    glob = (
        s.scored(TermQuery("probe"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    assert [r["doc_id"] for r in fed] == [r["doc_id"] for r in glob]


def test_federated_routing_prefers_term_bearing_shards(spark):
    # 'zebra' lives only on shard 0 (doc_id % 2 == 0)
    texts = []
    for i in range(12):
        texts.append("zebra hit pad" if i % 2 == 0 else "other words pad")
    _, s = _engine(spark, texts)
    fed = cori_routed_topk(s, "zebra", n_shards=2, n_probe=1, k=10).collect()
    assert {r["shard_id"] for r in fed} == {0}
    # all matches live on the probed shard, so nothing is lost
    assert all(r["global_overlap"] == min(10, 6) for r in fed)


def test_federated_partial_probe_bounds_overlap(spark):
    texts = ["probe common %d" % i for i in range(16)]
    _, s = _engine(spark, texts)
    fed = cori_routed_topk(s, "probe", n_shards=4, n_probe=2, k=8).collect()
    ov = fed[0]["global_overlap"]
    assert 0 <= ov <= 8
    assert len({r["shard_id"] for r in fed}) <= 2


def test_federated_validates_inputs(spark):
    _, s = _engine(spark, ["x y"])
    with pytest.raises(ValueError):
        cori_routed_topk(s, "x", n_shards=2, n_probe=3)
    with pytest.raises(ValueError):
        cori_routed_topk(s, "x", k=0)


# -------------------------------------------------------------------- borda
def test_borda_hand_computed(spark):
    a = _rk(spark, [(10, 1), (20, 2), (30, 3)])
    b = _rk(spark, [(20, 1), (10, 2), (40, 3)])
    rows = borda_fuse([a, b], k=3, topk=10).collect()
    # points: d10 = 3+2=5, d20 = 2+3=5, d30 = 1, d40 = 1
    got = [(r["doc_id"], r["points"]) for r in rows]
    assert got == [(10, 5), (20, 5), (30, 1), (40, 1)]
    r10 = rows[0]
    assert (r10["rank_0"], r10["rank_1"]) == (1, 2)


def test_borda_unranked_gets_zero_from_that_list(spark):
    a = _rk(spark, [(1, 1)])
    b = _rk(spark, [(2, 1)])
    rows = {r["doc_id"]: r for r in borda_fuse([a, b], k=5, topk=10).collect()}
    assert rows[1]["points"] == 5 and rows[1]["rank_1"] == 0
    assert rows[2]["points"] == 5 and rows[2]["rank_0"] == 0


def test_borda_consensus_beats_single_list_winner(spark):
    # doc 7 is 2nd in both lists (8 pts); doc 1 and doc 2 are 1st in
    # one list only (5 pts each)
    a = _rk(spark, [(1, 1), (7, 2), (3, 3)])
    b = _rk(spark, [(2, 1), (7, 2), (4, 3)])
    rows = borda_fuse([a, b], k=4, topk=1).collect()
    assert rows[0]["doc_id"] == 7


def test_borda_validates_inputs(spark):
    a = _rk(spark, [(1, 1)])
    with pytest.raises(ValueError):
        borda_fuse([], k=3)
    with pytest.raises(ValueError):
        borda_fuse([a], k=0)
