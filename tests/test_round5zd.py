"""Round-5 part-zd twins: SALSA and BM25 parameter sweep."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.pagerank import build_link_graph, salsa
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import bm25_param_sweep, ndcg_at_k
from lucenenet_spark.search.searcher import IndexSearcher


def _nodes(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


# ----------------------------------------------------------------- SALSA
def test_salsa_conserves_mass(spark):
    nodes = _nodes(spark, 30)
    a = salsa(nodes, build_link_graph(nodes), iterations=3).collect()
    total = sum(r["a"] for r in a)
    assert abs(total - 1.0) < 1e-9  # stochastic walk: no normalization needed


def test_salsa_matches_python_replica(spark):
    nodes = _nodes(spark, 12)
    edges = [(r["src"], r["dst"]) for r in build_link_graph(nodes).collect()]
    n = 12
    indeg: dict[int, int] = {}
    outdeg: dict[int, int] = {}
    for s, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
        outdeg[s] = outdeg.get(s, 0) + 1
    a = {i: 1.0 / n for i in range(n)}
    for _ in range(3):
        b: dict[int, float] = {}
        for s, d in edges:
            b[s] = b.get(s, 0.0) + a[d] / indeg[d]
        new = {i: 0.0 for i in range(n)}
        for s, d in edges:
            new[d] = new.get(d, 0.0) + b.get(s, 0.0) / outdeg[s]
        a = new
    got = {
        r["doc_id"]: r["a"]
        for r in salsa(nodes, build_link_graph(nodes), iterations=3).collect()
    }
    for i in range(n):
        assert abs(got[i] - a[i]) < 1e-12, i


def test_salsa_differs_from_uniform(spark):
    nodes = _nodes(spark, 25)
    vals = {r["a"] for r in salsa(nodes, build_link_graph(nodes)).collect()}
    assert len(vals) > 3  # the walk actually discriminates


# ------------------------------------------------------------ param sweep
@pytest.fixture(scope="module")
def sweep_index(spark):
    texts = [
        " ".join(["tune"] * (1 + i % 4) + [f"pad{j}" for j in range(i % 9)])
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return build_index(docs, text_col="text", id_col="doc_id").cache()


def test_sweep_rows_match_individual_ndcg(spark, sweep_index):
    grid = ((1.2, 0.75), (0.5, 0.1))
    rows = {
        (r["k1_q2"], r["b_q2"]): r
        for r in bm25_param_sweep(sweep_index, "tune", grid=grid, k=5).collect()
    }
    assert set(rows) == {(120, 75), (50, 10)}
    for (k1, b) in grid:
        s = IndexSearcher(sweep_index, mode="double", k1=k1, b=b)
        want = ndcg_at_k(s, "tune", k=5).collect()[0]
        got = rows[(int(k1 * 100), int(b * 100))]
        assert (got["dcg_q9"], got["idcg_q9"], got["ndcg_q"]) == (
            want["dcg_q9"],
            want["idcg_q9"],
            want["ndcg_q"],
        )


def test_sweep_idcg_shared_and_params_change_ranking(spark, sweep_index):
    rows = bm25_param_sweep(sweep_index, "tune", k=10).collect()
    idcgs = {r["idcg_q9"] for r in rows}
    assert len(idcgs) == 1  # qrels independent of parameters
    assert len(rows) == 4
    for r in rows:
        assert 0 < r["ndcg_q"] <= 1_000_000
