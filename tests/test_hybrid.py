"""RRF hybrid-retrieval invariants (search/hybrid.py)."""

import pytest
from pyspark.sql import SparkSession

from lucenenet_spark.search.hybrid import ranked, rrf_fuse, rrf_hybrid_topk

SF = "/root/testdata/sf0.001"


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


def _ranks(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_arithmetic_exact(spark):
    a = _ranks(spark, [(10, 1), (20, 2)])
    b = _ranks(spark, [(20, 1), (30, 2)])
    out = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60, topk=10).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61; doc 30: 1/62
    assert out[20]["rrf_q"] == int(1.0 / 62 * 1e7 + 1.0 / 61 * 1e7 + 0.5) or \
        out[20]["rrf_q"] == int((1.0 / 62 + 1.0 / 61) * 1e7 + 0.5)
    assert out[10]["rrf_q"] == int(1.0 / 61 * 1e7 + 0.5)
    assert out[30]["rrf_q"] == int(1.0 / 62 * 1e7 + 0.5)
    # both-list doc outranks either single-list doc
    top = rrf_fuse([a, b], k=60, topk=1).collect()[0]
    assert top["doc_id"] == 20
    assert (out[20]["rank_0"], out[20]["rank_1"]) == (2, 1)
    assert (out[10]["rank_0"], out[10]["rank_1"]) == (1, 0)


def test_ranked_orders_by_score_then_id(spark):
    top = spark.createDataFrame(
        [(5, 100), (3, 100), (9, 50)], "doc_id long, s long"
    )
    got = {r["doc_id"]: r["rank"] for r in ranked(top, "s").collect()}
    assert got == {3: 1, 5: 2, 9: 3}


def test_hybrid_end_to_end_contains_both_signals(spark):
    from lucenenet_spark.functions.similarity import cosine_topk
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.queries import TermQuery

    _, searcher, _ = get_engine(spark, SF)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = rrf_hybrid_topk(searcher, emb, "vector", 0, k_each=20, topk=10)
    rows = out.collect()
    assert len(rows) == 10
    # descending fused order with doc-id tie-break
    keys = [(-r["rrf_q"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    # the vector query's own id is sem rank 1 -> must appear in the fusion
    ids = {r["doc_id"] for r in rows}
    assert 0 in ids
    # every fused doc came from at least one list
    assert all(r["rank_0"] > 0 or r["rank_1"] > 0 for r in rows)
    # fused set is a subset of the two lists' union
    lex = {r["doc_id"] for r in searcher.scored(TermQuery("vector"))
           .orderBy("doc_id").collect()}
    sem = {r["vec_id"] for r in cosine_topk(emb, 0, k=20).collect()}
    assert ids <= (lex | sem)
