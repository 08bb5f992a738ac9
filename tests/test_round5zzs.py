"""Round-5 part-zzs twins: k-core peeling and degree assortativity."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.pagerank import degree_assortativity, kcore_peel


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, deg long"
    )


def test_kcore_replica(spark):
    # K4 core {0,1,2,3} plus a chain 3-4-5 that peels away over rounds
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    rows = {r["round"]: r["n_remaining"] for r in kcore_peel(_edges(spark, pairs), k=2, rounds=3).collect()}
    # round 1: nodes with deg>=2 = {0,1,2,3,4} (5 drops); round 2: 4 now
    # has deg 1 in the survivor graph -> drops; round 3: stable K4
    assert rows == {1: 5, 2: 4, 3: 4}


def test_kcore_3core_of_k4_tail(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    rows = {r["round"]: r["n_remaining"] for r in kcore_peel(_edges(spark, pairs), k=3, rounds=2).collect()}
    assert rows == {1: 4, 2: 4}  # K4 is its own 3-core


def test_kcore_validation(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError):
        kcore_peel(e, k=0)
    with pytest.raises(ValueError):
        kcore_peel(e, rounds=0)


def _assort_replica(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    stubs = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    m = len(stubs)
    s1 = sum(deg[u] for u, _ in stubs)
    s2 = sum(deg[u] ** 2 for u, _ in stubs)
    sjk = sum(deg[u] * deg[v] for u, v in stubs)
    den = m * s2 - s1 * s1
    r = (m * sjk - s1 * s1) / den if den else 0.0
    return m, s1, s2, sjk, math.floor(r * 1e9 + 0.5)


def test_assortativity_star_is_disassortative(spark):
    pairs = [(0, i) for i in range(1, 6)]  # star: perfectly disassortative
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    m, s1, s2, sjk, rq = _assort_replica(pairs)
    assert (row["m_stubs"], row["s1"], row["s2"], row["sjk"]) == (m, s1, s2, sjk)
    assert row["r_q9"] == rq == -(10**9)


def test_assortativity_regular_graph_degenerate(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 2-regular cycle: den = 0
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    assert row["r_q9"] == 0


def test_assortativity_mixed_replica(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (4, 5), (5, 6), (0, 4)]
    row = degree_assortativity(_edges(spark, pairs)).collect()[0]
    m, s1, s2, sjk, rq = _assort_replica(pairs)
    assert (row["m_stubs"], row["s1"], row["s2"], row["sjk"], row["r_q9"]) == (
        m, s1, s2, sjk, rq,
    )
