"""Round-5 part-zzzb twins: content-defined chunking and Misra-Gries
certified heavy hitters."""

from __future__ import annotations

import hashlib

import pytest

from lucenenet_spark.functions.cdc import cdc_chunks
from lucenenet_spark.functions.sketches import (
    certified_heavy_hitters,
    misra_gries_summary,
)

_W, _DIV, _MIN, _MAX = 8, 32, 16, 128


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_cdc(text: str, w=_W, div=_DIV, mn=_MIN, mx=_MAX):
    """Independent Python replica of the boundary fold."""
    cuts, last = [], 0
    n = len(text)
    for i in range(1, n + 1):
        cand = i >= w and _h32(text[i - w : i]) % div == 0
        if (i - last >= mn and cand) or (i - last >= mx):
            cuts.append(i)
            last = i
    if last < n and n > 0:
        cuts.append(n)
    out, prev = [], 0
    for idx, c in enumerate(cuts):
        out.append((idx, prev + 1, c - prev, _h32(text[prev:c])))
        prev = c
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


_BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across executors and the merge scheduler compacts "
    "segments into larger sorted runs for faster block max scoring"
)


def test_cdc_replica(spark):
    texts = [_BASE, _BASE[30:], "short doc here!!"]
    rows = cdc_chunks(_docs(spark, texts)).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], r["sig"])
        )
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _py_cdc(t), f"doc {i}"


def test_cdc_covers_text_and_respects_bounds(spark):
    rows = cdc_chunks(_docs(spark, [_BASE])).collect()
    rows.sort(key=lambda r: r["chunk_idx"])
    assert rows[0]["start"] == 1
    total = sum(r["chunk_len"] for r in rows)
    assert total == len(_BASE)
    # contiguity
    for a, b in zip(rows, rows[1:]):
        assert b["start"] == a["start"] + a["chunk_len"]
    # every chunk except the last respects [min, max]
    for r in rows[:-1]:
        assert _MIN <= r["chunk_len"] <= _MAX
    assert rows[-1]["chunk_len"] <= _MAX


def test_cdc_shift_invariance(spark):
    """The CDC selling point: prepending text realigns after the first
    content-defined cut, so most chunk signatures survive — unlike
    fixed-size chunking where every boundary shifts."""
    shifted = "INSERTED PREFIX >> " + _BASE
    rows = cdc_chunks(_docs(spark, [_BASE, shifted])).collect()
    sigs = {0: set(), 1: set()}
    for r in rows:
        sigs[r["doc_id"]].add(r["sig"])
    shared = sigs[0] & sigs[1]
    assert len(shared) >= len(sigs[0]) // 2, (sigs[0], sigs[1])
    # fixed-size chunking baseline shares NOTHING after an unaligned shift
    fixed0 = {_h32(_BASE[i : i + 32]) for i in range(0, len(_BASE), 32)}
    fixed1 = {_h32(shifted[i : i + 32]) for i in range(0, len(shifted), 32)}
    assert not (fixed0 & fixed1)


def test_cdc_min_len_validation(spark):
    with pytest.raises(ValueError, match="min_len"):
        cdc_chunks(_docs(spark, [_BASE]), window=8, min_len=4)


# ----------------------------------------------------------------------
# Misra-Gries
# ----------------------------------------------------------------------


def _stream(spark, items):
    return spark.createDataFrame(
        [(i, 0, t) for i, t in enumerate(items)], "doc_id long, pos long, term string"
    )


def _py_mg(items, k):
    counters = {}
    for t in items:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def test_mg_guarantee_no_heavy_term_lost(spark):
    # adversarial order: heavy term interleaved with k distinct spacers
    items = []
    for i in range(60):
        items.append("heavy")
        items.append(f"noise{i % 6}")
    n, k = len(items), 4
    got = {r["term"]: r["mg_count"] for r in misra_gries_summary(_stream(spark, items), k=k).collect()}
    # every term with true count > N/(k+1) must be present
    from collections import Counter

    true = Counter(items)
    for t, c in true.items():
        if c * (k + 1) > n:
            assert t in got, t
    # and no estimate exceeds the true count
    for t, est in got.items():
        assert est <= true[t]
        assert est >= true[t] - 2 * n // (k + 1)  # merged bound (2 partitions' worth)


def test_mg_certified_equals_bruteforce(spark):
    items = (["a"] * 50 + ["b"] * 30 + ["c"] * 10 + [f"x{i}" for i in range(10)]) * 2
    n, k = len(items), 3
    from collections import Counter

    true = Counter(items)
    want = sorted(
        (t, c, n) for t, c in true.items() if c * (k + 1) > n
    )
    got = sorted(
        (r["term"], r["true_count"], r["n_total"])
        for r in certified_heavy_hitters(_stream(spark, items), k=k).collect()
    )
    assert got == want
    assert ("a", 100, n) in got and ("b", 60, n) in got


def test_mg_uniform_stream_yields_nothing(spark):
    items = [f"t{i % 10}" for i in range(100)]  # all counts == N/10 < N/5
    assert certified_heavy_hitters(_stream(spark, items), k=4).count() == 0
