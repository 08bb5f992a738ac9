"""Round-5 part-zzzl twins: Benford digit audit and Gini concentration."""

from __future__ import annotations

import datetime
import math

from lucenenet_spark.functions.events import BENFORD_P, benford_digits, gini_activity

_TS = datetime.datetime(2024, 1, 15, 12, 0)


def _ev(spark, rows):
    # rows: (user_id, event_type, value)
    data = [(i, _TS, u, t, v) for i, (u, t, v) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _py_benford(values):
    cents = [math.floor(v * 100 + 0.5) for v in values]
    cents = [c for c in cents if c > 0]
    n = len(cents)
    out = []
    for d in range(1, 10):
        cnt = sum(1 for c in cents if str(c)[0] == str(d))
        p = BENFORD_P[d]
        e = float(n) * p
        out.append(
            (
                d,
                cnt,
                math.floor(e * 1e6 + 0.5),
                math.floor((float(cnt) - e) * (float(cnt) - e) / e * 1e6 + 0.5),
            )
        )
    return out


def test_benford_replica(spark):
    vals = [1.23, 19.99, 150.00, 2.50, 0.99, 31.41, 100.0, 88.8, 0.05, 7.77]
    rows = [(i, "purchase", v) for i, v in enumerate(vals)] + [(0, "view", 555.0)]
    got = [
        (r["digit"], r["cnt"], r["expected_q6"], r["chi2_contrib_q6"])
        for r in benford_digits(_ev(spark, rows)).collect()
    ]
    assert got == _py_benford(vals)
    assert sum(x[1] for x in got) == len(vals)  # view row excluded, all digits kept


def test_benford_digit_from_cents_not_float(spark):
    # 0.05 -> 5 cents -> digit 5 (not 0); 0.99 -> 99 -> digit 9
    rows = [(0, "purchase", 0.05), (1, "purchase", 0.99)]
    got = {r["digit"]: r["cnt"] for r in benford_digits(_ev(spark, rows)).collect()}
    assert got[5] == 1 and got[9] == 1 and got[1] == 0


def _py_gini(counts):
    xs = sorted(counts)
    n = len(xs)
    sx = sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    return math.floor((2 * six - (n + 1) * sx) / float(n * sx) * 1e6 + 0.5)


def test_gini_replica(spark):
    # users 0..3 with 1, 1, 2, 6 events
    rows = (
        [(0, "view", 0.0)]
        + [(1, "view", 0.0)]
        + [(2, "view", 0.0)] * 2
        + [(3, "view", 0.0)] * 6
    )
    r = gini_activity(_ev(spark, rows)).collect()[0]
    assert r["n_users"] == 4 and r["total_events"] == 10
    assert r["gini_q6"] == _py_gini([1, 1, 2, 6])


def test_gini_uniform_is_zero(spark):
    rows = [(u, "view", 0.0) for u in range(5) for _ in range(3)]
    r = gini_activity(_ev(spark, rows)).collect()[0]
    assert r["gini_q6"] == 0


def test_gini_concentration_increases(spark):
    flat = [(u, "view", 0.0) for u in range(4) for _ in range(2)]
    skew = [(0, "view", 0.0)] * 7 + [(1, "view", 0.0), (2, "view", 0.0), (3, "view", 0.0)]
    g1 = gini_activity(_ev(spark, flat)).collect()[0]["gini_q6"]
    g2 = gini_activity(_ev(spark, skew)).collect()[0]["gini_q6"]
    assert g2 > g1
