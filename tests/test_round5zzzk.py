"""Round-5 part-zzzk twins: EWMA anomaly residuals and OLS daily trend."""

from __future__ import annotations

import datetime
import math

from lucenenet_spark.functions.temporal import daily_trend_ols, ewma_residual_topk

_EPOCH = datetime.date(1970, 1, 1)


def _ev(spark, hours_counts):
    # hours_counts: dict hour -> n events at that absolute hour
    data = []
    i = 0
    for h, n in sorted(hours_counts.items()):
        for _ in range(n):
            ts = datetime.datetime.combine(
                _EPOCH + datetime.timedelta(days=h // 24), datetime.time(h % 24, 30)
            )
            data.append((i, ts, 1, "view", 0.0))
            i += 1
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _py_ewma(hours_counts, k=10, an=1, ad=4):
    lo, hi = min(hours_counts), max(hours_counts)
    series = [(h, hours_counts.get(h, 0)) for h in range(lo, hi + 1)]
    q = 1_000_000
    s = series[0][1] * q
    rows = []
    for h, c in series[1:]:
        rows.append((h, c, s, c * q - s))
        s = (an * c * q + (ad - an) * s) // ad
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    return rows[:k]


def test_ewma_replica(spark):
    hc = {100: 5, 101: 5, 102: 20, 103: 5, 105: 6, 106: 5}  # 104 missing -> 0
    got = [
        (r["hour"], r["cnt"], r["pred_q6"], r["resid_q6"])
        for r in ewma_residual_topk(_ev(spark, hc), k=10).collect()
    ]
    assert got == _py_ewma(hc)


def test_ewma_spike_ranks_first(spark):
    hc = {h: 4 for h in range(200, 220)}
    hc[210] = 50
    top = ewma_residual_topk(_ev(spark, hc), k=3).collect()
    assert top[0]["hour"] == 210 and top[0]["resid_q6"] > 0
    # the hour AFTER the spike has the largest negative residual
    assert top[1]["hour"] == 211 and top[1]["resid_q6"] < 0


def test_ewma_constant_series_zero_residuals(spark):
    hc = {h: 7 for h in range(50, 60)}
    got = ewma_residual_topk(_ev(spark, hc), k=5).collect()
    assert all(r["resid_q6"] == 0 and r["pred_q6"] == 7_000_000 for r in got)


def _py_ols(day_counts):
    lo, hi = min(day_counts), max(day_counts)
    pts = [(d - lo, day_counts.get(d, 0)) for d in range(lo, hi + 1)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    dx, dy, num = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy

    def q6(v):
        return math.floor(v * 1e6 + 0.5)

    slope = q6(float(num) / float(dx)) if dx > 0 else 0
    inter = q6(float(sy * sxx - sx * sxy) / float(dx)) if dx > 0 else 0
    r2 = q6(float(num) * float(num) / float(dx * dy)) if dx > 0 and dy > 0 else 0
    return n, slope, inter, r2


def _ev_days(spark, day_counts):
    return _ev(spark, {d * 24 + 12: n for d, n in day_counts.items()})


def test_ols_replica(spark):
    dc = {10: 3, 11: 5, 12: 4, 14: 9, 15: 11}  # day 13 missing -> 0
    r = daily_trend_ols(_ev_days(spark, dc)).collect()[0]
    assert (r["n_days"], r["slope_q6"], r["intercept_q6"], r["r2_q6"]) == _py_ols(dc)


def test_ols_perfect_line(spark):
    dc = {d: 2 * (d - 20) + 3 for d in range(20, 26)}  # y = 2x + 3 exactly
    r = daily_trend_ols(_ev_days(spark, dc)).collect()[0]
    assert r["slope_q6"] == 2_000_000
    assert r["intercept_q6"] == 3_000_000
    assert r["r2_q6"] == 1_000_000


def test_ols_flat_series_r2_zero(spark):
    dc = {d: 4 for d in range(30, 35)}
    r = daily_trend_ols(_ev_days(spark, dc)).collect()[0]
    assert r["slope_q6"] == 0 and r["r2_q6"] == 0
