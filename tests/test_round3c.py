"""Round-3c: IVF ANN, collector combinators (time-limiting, caching,
early-terminating)."""

import time

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.functions import similarity as fsim
from lucenenet_spark.search.collectors import (
    TimeExceededError,
    caching_collector,
    early_terminating_topk,
    time_limited_collect,
)


# ------------------------------------------------------------- IVF ANN
def test_ivf_assignment_deterministic_and_partitioned(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = fsim.ivf_centroids(8, seed=7, dim=64)
    a1 = {r["vec_id"]: r["cid"] for r in fsim.ivf_assign(emb, cents).collect()}
    a2 = {r["vec_id"]: r["cid"] for r in fsim.ivf_assign(emb, cents).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(8))


def test_ivf_topk_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [r["vec_id"] for r in fsim.cosine_topk(emb, 0, 10).collect()]
    approx = [
        r["vec_id"]
        for r in fsim.ivf_topk(emb, 0, 10, n_centroids=8, nprobe=4, quantized=True).collect()
    ]
    # query's own cell always probed -> query itself is always recalled;
    # generous probe count keeps recall meaningful on the tiny fixture
    assert approx[0] == exact[0] == 0
    assert len(set(approx) & set(exact)) >= 5


# ------------------------------------------------------------- collectors
@pytest.fixture(scope="module")
def idx(spark):
    rows = [(d, f"hot f{d % 97} f{(d * 7) % 89}") for d in range(2000)]
    return build_index(spark.createDataFrame(rows, "doc_id long, text string")).cache()


def test_time_limited_collect_passes_fast_query(idx, spark):
    s = IndexSearcher(idx)
    out = time_limited_collect(s.search(TermQuery("hot"), 5), timeout_sec=120.0)
    assert len(out) == 5


def test_time_limited_collect_cancels(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def slow(x):
        time.sleep(20)
        return x

    df = spark.range(64).repartition(8).select(slow("id").alias("v"))
    t0 = time.time()
    with pytest.raises(TimeExceededError):
        time_limited_collect(df, timeout_sec=1.5)
    assert time.time() - t0 < 15  # cancelled well before the 20s sleeps finish


def test_caching_collector_replay(idx, spark):
    s = IndexSearcher(idx)
    cached = caching_collector(s, TermQuery("f11"))
    try:
        n = cached.count()
        # replay into two downstream "collectors"
        assert cached.join(idx.doclens, "doc_id").count() == n
        assert cached.count() == n
    finally:
        cached.unpersist()


def test_early_terminating_topk_plan_and_rows(spark):
    # range-sorted layout by the sort key = index sorting; limit(k) reads
    # leading partitions only (CollectLimit incremental execution)
    df = (
        spark.range(0, 100_000)
        .selectExpr("id", "id % 1000 AS price")
        .repartitionByRange(16, "price", "id")
        .sortWithinPartitions("price", "id")
    )
    out = early_terminating_topk(df, 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    rows = out.collect()
    assert [r["price"] for r in rows] == [0, 0, 0, 0, 0]


# ------------------------------------------------------------- sweet spot
def test_sweetspot_norm_degrades_to_default():
    """SweetSpotSimilarityTest.cs TestSweetSpotComputeNorm base case:
    min=max=1, steepness=0.5 must produce DefaultSimilarity's norm BYTE
    for every length 1..999."""
    import numpy as np

    from lucenenet_spark.index.smallfloat import float_to_byte315
    from lucenenet_spark.search.sweetspot import compute_length_norm

    for i in range(1, 1000):
        d = int(float_to_byte315(np.float32(1.0 / np.sqrt(np.float64(i)))))
        s = int(float_to_byte315(np.float32(compute_length_norm(i, 1, 1, 0.5))))
        assert d == s, i


def test_sweetspot_plateau_and_shift():
    import numpy as np

    from lucenenet_spark.index.smallfloat import byte315_to_float, float_to_byte315
    from lucenenet_spark.search.sweetspot import compute_length_norm

    # 3..10 plateau: encode+decode == 1.0 exactly (reference asserts 0 delta)
    for i in range(3, 11):
        b = int(float_to_byte315(np.float32(compute_length_norm(i, 3, 10, 0.5))))
        assert float(byte315_to_float(b)) == 1.0, i
    # beyond the plateau: norm(i; 3,10) == default norm(i - 9)
    for i in range(10, 1000):
        d = int(float_to_byte315(np.float32(1.0 / np.sqrt(np.float64(i - 9)))))
        s = int(float_to_byte315(np.float32(compute_length_norm(i, 3, 10, 0.5))))
        assert d == s, i


def test_sweetspot_baseline_and_hyperbolic_tf():
    import math

    from lucenenet_spark.search.sweetspot import baseline_tf, hyperbolic_tf

    # degrades to sqrt(freq) at base=min=0
    assert baseline_tf(0.0) == 0.0
    assert abs(baseline_tf(4.0) - 2.0) < 1e-6
    # base case: freq <= min -> base
    assert baseline_tf(1.0, tf_base=1.5, tf_min=2.0) == pytest.approx(1.5)
    assert baseline_tf(9.0, tf_base=1.5, tf_min=2.0) == pytest.approx(
        math.sqrt(9.0 + 1.5 * 1.5 - 2.0), rel=1e-6
    )
    # hyperbolic: midpoint -> (min+max)/2, far right -> max, far left -> min
    assert hyperbolic_tf(10.0) == pytest.approx(1.0, rel=1e-6)
    assert hyperbolic_tf(1000.0) == pytest.approx(2.0, rel=1e-6)
    assert hyperbolic_tf(0.5) < 0.2


def test_pattern_replace_analyzer():
    from lucenenet_spark.analysis.analyzers import PatternReplaceAnalyzer

    a = PatternReplaceAnalyzer(r"v[0-9]ct[0-9]r", "vector")
    assert a.terms("a v3ct0r and v9ct9r here") == ["vector", "vector", "here"]


# ------------------------------------------------------------- router
def test_routed_searcher_rank_identical_on_reference_queries(spark):
    from lucenenet_spark.queryparser import QueryParser
    from lucenenet_spark.search.router import RoutedSearcher
    from lucenenet_spark.testgen import REFERENCE_QUERIES, corpus_parquet

    docs = spark.read.parquet(corpus_parquet(3000, "/root/repo/.bench_cache"))
    idx = build_index(docs).cache()
    idx.postings.count()
    routed = RoutedSearcher(idx)
    routed.block.blocks = routed.block.blocks.cache()
    routed.block.blocks.count()
    base = IndexSearcher(idx, mode="lucene")
    p = QueryParser()
    routes = {}
    for qid, qs in REFERENCE_QUERIES:
        q = p.parse(qs)
        a = [(r["doc_id"], round(r["score"], 5)) for r in base.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 5)) for r in routed.search(q, 10).collect()]
        assert a == b, (qid, qs, a[:3], b[:3])
        routes[qid] = routed.last_route
    # the block path must actually carry the bulk of the log
    assert sum(1 for v in routes.values() if v == "block") >= 10, routes


# ------------------------------------------------------------- FVH
def test_fvh_marks_only_phrase_participants(spark):
    from lucenenet_spark.search.fvh import fvh_phrase_fragments

    rows = [
        (0, "key alone here then key agg match and more words after"),
        (1, "agg key reversed no match"),
        (2, "x y key agg z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs).cache()
    out = {r["doc_id"]: r["frag"] for r in fvh_phrase_fragments(idx, docs, ["key", "agg"]).collect()}
    assert set(out) == {0, 2}
    # doc 0: the isolated leading 'key' (pos 0) is NOT bolded; match at 4
    assert out[0] == "alone here then <b>key</b> <b>agg</b> match and more"
    # doc 2: window clamps at doc start/end
    assert out[2] == "x y <b>key</b> <b>agg</b> z"


def test_router_plan_cache(spark):
    from lucenenet_spark.search.router import RoutedSearcher

    rows = [(d, f"hot w{d % 13}") for d in range(512)]
    idx = build_index(spark.createDataFrame(rows, "doc_id long, text string")).cache()
    s = RoutedSearcher(idx)
    q = TermQuery("hot")
    a = s.search(q, 5).collect()
    assert s.last_route == "block"
    b = s.search(TermQuery("hot"), 5).collect()  # equal (frozen dataclass) key
    assert s.last_route == "block+cached"
    assert a == b
