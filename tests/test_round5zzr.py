"""Round-5 part-zzr twins: co-citation and bibliographic coupling."""

from __future__ import annotations

from itertools import combinations

import pytest

from lucenenet_spark.functions.pagerank import bibliographic_coupling, cocitation_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, deg long"
    )


def _brute(pairs):
    e = {tuple(p) for p in pairs}
    outs = {}
    ins = {}
    for s, d in e:
        outs.setdefault(s, set()).add(d)
        ins.setdefault(d, set()).add(s)
    co = {}
    for a, b in combinations(sorted(ins), 2):
        c = len(ins[a] & ins[b])
        if c:
            co[(a, b)] = c
    bc = {}
    for a, b in combinations(sorted(outs), 2):
        c = len(outs[a] & outs[b])
        if c:
            bc[(a, b)] = c
    return co, bc


def test_cocitation_and_coupling_replica(spark):
    pairs = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 11), (3, 12),
        (4, 99),
        (2, 10),  # duplicate edge must not double-count
    ]
    e = _edges(spark, pairs)
    want_co, want_bc = _brute(pairs)
    got_co = {(r["a"], r["b"]): r["n_common"] for r in cocitation_pairs(e).collect()}
    got_bc = {(r["a"], r["b"]): r["n_shared"] for r in bibliographic_coupling(e).collect()}
    assert got_co == want_co
    assert got_bc == want_bc
    # pages 10 and 11 are co-cited by sources 1 and 2
    assert got_co[(10, 11)] == 2
    # sources 1 and 2 share out-links {10, 11}
    assert got_bc[(1, 2)] == 2


def test_min_count_filter_and_validation(spark):
    pairs = [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)]
    e = _edges(spark, pairs)
    strong = {(r["a"], r["b"]) for r in cocitation_pairs(e, min_count=2).collect()}
    assert strong == {(10, 11)}
    with pytest.raises(ValueError):
        cocitation_pairs(e, min_count=0)
    with pytest.raises(ValueError):
        bibliographic_coupling(e, min_count=0)
