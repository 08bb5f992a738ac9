"""Round-5 part-zzn twins: triangle counting and clustering
coefficients vs a brute-force replica."""

from __future__ import annotations

from itertools import combinations

from lucenenet_spark.functions.pagerank import (
    local_clustering,
    triangle_counts,
    triangle_summary,
    undirected_simple,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, deg long"
    )


def _brute(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nodes = {v for e in und for v in e}
    nbrs = {v: set() for v in nodes}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tris = {
        t
        for t in combinations(sorted(nodes), 3)
        if (t[0], t[1]) in und and (t[0], t[2]) in und and (t[1], t[2]) in und
    }
    per = {v: sum(1 for t in tris if v in t) for v in nodes}
    return und, nbrs, tris, per


def test_triangle_replica_k4_plus_tail(spark):
    # K4 on 0-3 (4 triangles) plus a pendant edge and a duplicate edge
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (1, 0), (5, 5)]
    e = _edges(spark, pairs)
    und, nbrs, tris, per = _brute(pairs)
    assert undirected_simple(e).count() == len(und) == 7
    got = {r["node"]: r["tri"] for r in triangle_counts(e).collect()}
    assert got == {v: c for v, c in per.items() if c > 0}
    s = triangle_summary(e).collect()[0]
    assert s["n_triangles"] == len(tris) == 4
    assert s["n_nodes"] == len(nbrs)
    assert s["n_wedges"] == sum(
        len(n) * (len(n) - 1) // 2 for n in nbrs.values()
    )


def test_triangle_free_graph(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 4-cycle: wedges, no triangles
    e = _edges(spark, pairs)
    s = triangle_summary(e).collect()[0]
    assert s["n_triangles"] == 0 and s["global_cc_q9"] == 0
    assert s["n_wedges"] == 4
    assert triangle_counts(e).count() == 0


def test_local_clustering_exact(spark):
    # node 0: neighbors {1,2,3}, edges among them: (1,2) only -> cc = 1/3
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2)]
    e = _edges(spark, pairs)
    rows = {r["node"]: r for r in local_clustering(e).collect()}
    assert rows[0]["deg"] == 3 and rows[0]["tri"] == 1
    assert rows[0]["cc_q9"] == round(1 / 3 * 1e9)
    assert rows[1]["cc_q9"] == 10**9  # deg 2, 1 triangle -> cc 1
    assert rows[3]["deg"] == 1 and rows[3]["cc_q9"] == 0


def test_transitivity_complete_graph_is_one(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    s = triangle_summary(_edges(spark, pairs)).collect()[0]
    assert s["global_cc_q9"] == 10**9
