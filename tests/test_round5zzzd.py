"""Round-5 part-zzzd twins: SimRank and perceptual-hash near-dup."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.multimodal import (
    dct_table,
    perceptual_hash,
    phash_near_dup_pairs,
)
from lucenenet_spark.functions.pagerank import simrank_pairs

Q9 = 10**9


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _nodes(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _py_simrank(edges, n, iterations=2):
    """Independent replica: dense DP with the same rational-C rounding."""
    inn = {}
    for s, d in edges:
        inn.setdefault(d, {}).setdefault(s, 0)
        inn[d][s] += 1
    indeg = {v: sum(m.values()) for v, m in inn.items()}
    s = {}  # (a,b) a<b -> q9
    for _ in range(iterations):
        nxt = {}
        for a in inn:
            for b in inn:
                if a >= b:
                    continue
                x = 0
                for i, ma in inn[a].items():
                    for j, mb in inn[b].items():
                        if i == j:
                            sij = Q9
                        else:
                            sij = s.get((min(i, j), max(i, j)), 0)
                        x += ma * mb * sij
                if x == 0:
                    continue
                d = indeg[a] * indeg[b]
                v = (8 * x + 5 * d) // (10 * d)
                if v > 0:
                    nxt[(a, b)] = v
        s = nxt
    return s


def test_simrank_replica(spark):
    # small graph with shared in-neighbors and multiplicity
    rows = [(0, 2), (1, 2), (0, 3), (1, 3), (1, 3), (2, 4), (3, 4), (2, 5), (3, 5), (4, 0)]
    got = {
        (r["a"], r["b"]): r["s_q9"]
        for r in simrank_pairs(_nodes(spark, 6), _edges(spark, rows)).collect()
    }
    want = _py_simrank(rows, 6)
    assert got == want


def test_simrank_cocitation_structure_first_iteration(spark):
    # iteration 1 is exactly C * |I(a) cap I(b)| / (|I(a)||I(b)|)
    rows = [(0, 2), (1, 2), (0, 3), (1, 3)]
    got = {
        (r["a"], r["b"]): r["s_q9"]
        for r in simrank_pairs(_nodes(spark, 4), _edges(spark, rows), iterations=1).collect()
    }
    # I(2) = I(3) = {0,1}: s(2,3) = 0.8 * 2 / 4 = 0.4
    assert got == {(2, 3): 4 * Q9 // 10}


def test_simrank_symmetric_pairs_bounded(spark):
    rows = [(0, 2), (1, 2), (0, 3), (1, 3), (2, 4), (3, 4)]
    for r in simrank_pairs(_nodes(spark, 5), _edges(spark, rows), iterations=2).collect():
        assert r["a"] < r["b"]
        assert 0 < r["s_q9"] <= 8 * Q9 // 10  # s(a,b) <= C for a != b


def test_simrank_validates_iterations(spark):
    with pytest.raises(ValueError):
        simrank_pairs(_nodes(spark, 2), _edges(spark, [(0, 1)]), iterations=0)


# ----------------------------------------------------------------------
# pHash
# ----------------------------------------------------------------------


def _py_phash(payload: bytes) -> int:
    hx = hashlib.sha256(payload).hexdigest()
    pix = [[int(hx[8 * x + y], 16) for y in range(8)] for x in range(8)]
    t = {}
    for u, x, w in dct_table():
        t[(u, x)] = w
    coefs = {}
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue
            coefs[(u, v)] = sum(
                pix[x][y] * t[(u, x)] * t[(v, y)] for x in range(8) for y in range(8)
            )
    ordered = sorted(coefs.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
    med = ordered[31][1]
    fp = 0
    for (u, v), c in coefs.items():
        if c > med:
            fp += 2 ** (u * 8 + v - 1)
    return fp


def _media(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )


def test_phash_replica(spark):
    payloads = [b"hello world", b"hello worlb", b"completely different payload", b""]
    got = {r["media_id"]: r["phash"] for r in perceptual_hash(_media(spark, payloads)).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == _py_phash(p), i


def test_phash_identical_payloads_distance_zero(spark):
    payloads = [b"same bytes", b"same bytes", b"other bytes entirely"]
    rows = phash_near_dup_pairs(_media(spark, payloads), top_n=3).collect()
    assert (rows[0]["doc_a"], rows[0]["doc_b"], rows[0]["hamming"]) == (0, 1, 0)
    # unrelated payloads land near the random-expectation ~31.5, far from 0
    assert all(r["hamming"] > 8 for r in rows[1:])


def test_phash_dct_basis_is_cosine_quantized(spark):
    t = {(u, x): w for u, x, w in dct_table()}
    assert t[(0, 0)] == 1000  # cos(0)
    for u in range(8):
        for x in range(8):
            want = int(round(math.cos(math.pi * (2 * x + 1) * u / 16) * 1000))
            assert t[(u, x)] == want
