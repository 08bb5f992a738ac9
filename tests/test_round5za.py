"""Round-5 part-za twins: HLL sketch, weighted sampling, boilerplate."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.crawl import boilerplate_shingles
from lucenenet_spark.functions.sketches import (
    _alpha,
    hll_estimate,
    hll_registers,
    weighted_sample,
)


def _py_hll(values: list[str], p: int = 9) -> tuple[int, int]:
    """(v_empty, est_q) replica of the sketch pipeline."""
    m = 1 << p
    width = 64 - p
    regs: dict[int, int] = {}
    for v in values:
        hx = hashlib.md5(v.encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        bucket = hi >> (32 - p)
        rest = (hi - (bucket << (32 - p))) * (1 << 32) + lo
        rank = width + 1 - rest.bit_length() if rest > 0 else width + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    s_a = sum(1 << (31 - r) for r in regs.values() if r <= 30)
    s_b = sum(1 << (61 - r) for r in regs.values() if r > 30)
    v_empty = m - len(regs)
    denom = (s_a / float(2**31) + s_b / float(2**61)) + float(v_empty)
    raw = _alpha(m) * m * m / denom
    if raw <= 2.5 * m and v_empty > 0:
        raw = float(m) * math.log(float(m) / v_empty)
    return v_empty, math.floor(raw + 0.5)


def _values_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "w string")


# ----------------------------------------------------------------------- HLL
def test_hll_matches_python_replica(spark):
    vals = [f"term{i}" for i in range(3000)] + [f"term{i}" for i in range(500)]
    est = hll_estimate(hll_registers(_values_df(spark, vals), "w")).collect()[0]
    v_empty, est_q = _py_hll(sorted(set(vals)))
    assert (est["m"], est["v_empty"], est["est_q"]) == (512, v_empty, est_q)


def test_hll_accuracy_within_expected_error(spark):
    true_n = 2000
    vals = [f"u{i}" for i in range(true_n)]
    est = hll_estimate(hll_registers(_values_df(spark, vals), "w")).collect()[0]
    # p=9 -> ~4.6% stderr; allow 4 sigma
    assert abs(est["est_q"] - true_n) / true_n < 0.2


def test_hll_small_range_linear_counting(spark):
    vals = [f"x{i}" for i in range(10)]
    est = hll_estimate(hll_registers(_values_df(spark, vals), "w")).collect()[0]
    assert est["v_empty"] >= 502
    # linear counting is near-exact at this occupancy
    assert abs(est["est_q"] - 10) <= 1


def test_hll_registers_merge_by_max(spark):
    a = [f"a{i}" for i in range(400)]
    b = [f"b{i}" for i in range(400)] + a[:100]
    ra = {r["bucket"]: r["reg"] for r in hll_registers(_values_df(spark, a), "w").collect()}
    rb = {r["bucket"]: r["reg"] for r in hll_registers(_values_df(spark, b), "w").collect()}
    ru = {
        r["bucket"]: r["reg"]
        for r in hll_registers(_values_df(spark, a + b), "w").collect()
    }
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == ru  # the union sketch IS the pairwise max


# ----------------------------------------------------------- weighted sample
def test_weighted_sample_keys_match_replica(spark):
    docs = spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(60)], "doc_id long, n_chars long"
    )
    rows = weighted_sample(docs, k=60).collect()
    for r in rows:
        hx = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        u = (int(hx[:8], 16) + 1.0) / (2**32 + 1.0)
        key = math.log(u) / r["weight"]
        assert r["key_q9"] == math.floor(key * 1e9 + 0.5)
    assert [r["rank"] for r in rows] == list(range(1, 61))
    keys = [r["key_q9"] for r in rows]
    assert keys == sorted(keys, reverse=True)


def test_weighted_sample_skips_nonpositive_weights(spark):
    docs = spark.createDataFrame(
        [(0, 0), (1, -5), (2, 50), (3, 50)], "doc_id long, n_chars long"
    )
    got = {r["doc_id"] for r in weighted_sample(docs, k=10).collect()}
    assert got == {2, 3}


# --------------------------------------------------------------- boilerplate
def test_boilerplate_detects_injected_footer(spark):
    footer = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [
            (0, "unique alpha words one " + footer, "h1"),
            (1, "other beta content two " + footer, "h1"),
            (2, "more gamma stuff three " + footer, "h1"),
            (3, "clean page without chrome four", "h1"),
            (4, "different host page " + footer, "h2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = boilerplate_shingles(docs, min_docs=3, min_frac=0.5, top=50).collect()
    shingles = {(r["host"], r["shingle"]) for r in rows}
    assert ("h1", "all rights reserved") in shingles
    assert ("h1", "rights reserved worldwide") in shingles
    # h2 has the footer in 1/1 docs but fails min_docs
    assert all(h == "h1" for h, _ in shingles)
    for r in rows:
        assert r["n_docs"] == 3 and r["host_docs"] == 4


def test_boilerplate_fraction_threshold_is_exact(spark):
    # shingle in exactly 2 of 4 docs: frac 0.5 passes >= 0.5, fails > via 0.500001
    docs = spark.createDataFrame(
        [(i, ("x y z " if i < 2 else "a b c ") + f"u{i} v{i} w{i}", "h") for i in range(4)],
        "doc_id long, text string, source string",
    )
    at_half = boilerplate_shingles(docs, min_docs=2, min_frac=0.5, top=50).collect()
    assert ("x y z" in {r["shingle"] for r in at_half})
    above = boilerplate_shingles(docs, min_docs=2, min_frac=0.500001, top=50).collect()
    assert "x y z" not in {r["shingle"] for r in above}
