"""Round-5 part-zzz twins: BFS distances and harmonic centrality."""

from __future__ import annotations

from collections import deque

import pytest

from lucenenet_spark.functions.pagerank import bfs_distances, harmonic_centrality_seed


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, deg long"
    )


def _brute_bfs(pairs, source, max_hops):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    dist = {source: 0}
    q = deque([source])
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_replica_directed_chain_and_branch(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (9, 0), (6, 7)]
    got = {r["node"]: r["dist"] for r in bfs_distances(_edges(spark, pairs), 0, 6).collect()}
    want = _brute_bfs(pairs, 0, 6)
    assert got == want
    assert 9 not in got  # edges are directed: 9->0 doesn't make 9 reachable
    assert 6 not in got and 7 not in got  # disconnected component


def test_bfs_hop_bound(spark):
    pairs = [(i, i + 1) for i in range(10)]
    got = {r["node"]: r["dist"] for r in bfs_distances(_edges(spark, pairs), 0, 3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # nodes past 3 hops absent


def test_bfs_shortest_of_two_paths(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]  # direct edge beats the chain
    got = {r["node"]: r["dist"] for r in bfs_distances(_edges(spark, pairs), 0, 6).collect()}
    assert got[3] == 1


def test_harmonic_replica(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (3, 4)]
    row = harmonic_centrality_seed(_edges(spark, pairs), 0, 6).collect()[0]
    want = _brute_bfs(pairs, 0, 6)
    contrib = sum(10**9 // d for n, d in want.items() if d > 0)
    assert row["n_reached"] == len(want) - 1
    assert row["harmonic_q9_sum"] == contrib


def test_bfs_validation(spark):
    with pytest.raises(ValueError):
        bfs_distances(_edges(spark, [(0, 1)]), 0, 0)
