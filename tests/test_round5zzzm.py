"""Round-5 part-zzzm twins: Mann-Whitney U and Mann-Kendall trend."""

from __future__ import annotations

import datetime
import math

from lucenenet_spark.functions.survival import mann_whitney_u
from lucenenet_spark.functions.temporal import mann_kendall_trend

_EPOCH = datetime.date(1970, 1, 1)


def _ev(spark, rows):
    # rows: (user_id, day, event_type, value)
    data = [
        (
            i,
            datetime.datetime.combine(
                _EPOCH + datetime.timedelta(days=d), datetime.time(10, 0)
            ),
            u,
            t,
            v,
        )
        for i, (u, d, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _py_mwu(pairs):
    # pairs: (arm, cents)
    cents = sorted(c for _, c in pairs)
    first = {}
    count = {}
    for i, c in enumerate(cents):
        first.setdefault(c, i + 1)
        count[c] = count.get(c, 0) + 1
    r2 = {c: 2 * first[c] + count[c] - 1 for c in count}
    n1 = sum(1 for a, _ in pairs if a == 0)
    n2 = sum(1 for a, _ in pairs if a == 1)
    r1x2 = sum(r2[c] for a, c in pairs if a == 0)
    u1x2 = r1x2 - n1 * (n1 + 1)
    n = n1 + n2
    tsum = sum(t**3 - t for t in count.values())
    if n1 > 0 and n2 > 0 and n > 1:
        var = (n1 * n2) / 12.0 * (float(n + 1) - float(tsum) / float(n * (n - 1)))
        z = math.floor(float(u1x2 - n1 * n2) / (2.0 * math.sqrt(var)) * 1e6 + 0.5)
    else:
        z = 0
    return n1, n2, r1x2, u1x2, z


def test_mwu_replica(spark):
    rows = [
        (0, 1, "purchase", 1.00), (2, 1, "purchase", 2.00), (4, 1, "purchase", 2.00),
        (1, 1, "purchase", 3.00), (3, 1, "purchase", 2.00), (5, 1, "purchase", 9.99),
        (7, 1, "purchase", 1.00), (6, 1, "view", 500.0),
    ]
    pairs = [(u % 2, math.floor(v * 100 + 0.5)) for u, _, t, v in rows if t == "purchase"]
    r = mann_whitney_u(_ev(spark, rows)).collect()[0]
    assert (r["n1"], r["n2"], r["r1_x2"], r["u1_x2"], r["z_q6"]) == _py_mwu(pairs)


def test_mwu_shifted_distribution_sign(spark):
    # arm 1 (odd users) strictly larger values -> U1 below mean -> z < 0
    rows = [(2 * i, 1, "purchase", 1.0 + i * 0.01) for i in range(6)] + [
        (2 * i + 1, 1, "purchase", 100.0 + i) for i in range(6)
    ]
    r = mann_whitney_u(_ev(spark, rows)).collect()[0]
    assert r["z_q6"] < 0 and r["u1_x2"] == 0


def test_mwu_identical_arms_z_zero(spark):
    rows = [(0, 1, "purchase", 5.0), (1, 1, "purchase", 5.0)]
    r = mann_whitney_u(_ev(spark, rows)).collect()[0]
    assert r["z_q6"] == 0  # U1 == n1*n2/2 exactly


def _py_mk(day_counts):
    lo, hi = min(day_counts), max(day_counts)
    ys = [day_counts.get(d, 0) for d in range(lo, hi + 1)]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tt = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var18 = n * (n - 1) * (2 * n + 5) - tt
    if var18 > 0 and s != 0:
        corr = s - 1 if s > 0 else s + 1
        z = math.floor(float(corr) / math.sqrt(var18 / 18.0) * 1e6 + 0.5)
    else:
        z = 0
    return n, s, var18, z


def _ev_days(spark, day_counts):
    rows = []
    for d, k in day_counts.items():
        rows += [(1, d, "view", 0.0)] * k
    return _ev(spark, rows)


def test_mk_replica(spark):
    dc = {10: 2, 11: 5, 12: 3, 14: 7, 15: 7}  # day 13 gap -> 0
    r = mann_kendall_trend(_ev_days(spark, dc)).collect()[0]
    assert (r["n_days"], r["s_stat"], r["var18"], r["z_q6"]) == _py_mk(dc)


def test_mk_increasing_series_positive(spark):
    dc = {d: d - 19 for d in range(20, 28)}
    r = mann_kendall_trend(_ev_days(spark, dc)).collect()[0]
    n = r["n_days"]
    assert r["s_stat"] == n * (n - 1) // 2  # every pair concordant
    assert r["z_q6"] > 0


def test_mk_constant_series_zero(spark):
    dc = {d: 4 for d in range(30, 36)}
    r = mann_kendall_trend(_ev_days(spark, dc)).collect()[0]
    assert r["s_stat"] == 0 and r["z_q6"] == 0 and r["var18"] == 0
