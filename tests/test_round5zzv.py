"""Round-5 part-zzv twins: hourly autocorrelation and rate spikes."""

from __future__ import annotations

import datetime
import math

import pytest

from lucenenet_spark.functions.temporal import (
    hourly_counts,
    periodicity_autocorr,
    rate_spike_topk,
)


def _events(spark, hour_counts):
    """hour_counts: {hour_index: n_events} within one day span."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for h, n in hour_counts.items():
        for _ in range(n):
            rows.append((i, base + datetime.timedelta(hours=h, minutes=i % 50)))
            i += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_hourly_counts_zero_fill(spark):
    ev = _events(spark, {0: 2, 3: 1})
    rows = {r["hour"]: r["cnt"] for r in hourly_counts(ev).collect()}
    hours = sorted(rows)
    assert len(hours) == 4  # hours 0..3 dense
    assert rows[hours[0]] == 2 and rows[hours[1]] == 0
    assert rows[hours[2]] == 0 and rows[hours[3]] == 1


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sx2 = sum(a * a for a in xs)
    sy2 = sum(b * b for b in ys)
    vx, vy = n * sx2 - sx * sx, n * sy2 - sy * sy
    if vx <= 0 or vy <= 0:
        return 0
    return math.floor((n * sxy - sx * sy) / math.sqrt(vx * vy) * 1e9 + 0.5)


def test_autocorr_replica_periodic_series(spark):
    # period-2 series: strong negative r(1), strong positive r(2)
    series = {h: (5 if h % 2 == 0 else 1) for h in range(12)}
    ev = _events(spark, series)
    rows = {r["lag"]: r for r in periodicity_autocorr(ev, lags=(1, 2)).collect()}
    cnts = [series[h] for h in range(12)]
    for lag in (1, 2):
        want = _pearson(cnts[:-lag], cnts[lag:])
        assert rows[lag]["r_q9"] == want
    assert rows[2]["r_q9"] == 10**9  # exact period -> perfect correlation
    assert rows[1]["r_q9"] < 0


def test_autocorr_constant_series_zero(spark):
    ev = _events(spark, {h: 3 for h in range(6)})
    rows = periodicity_autocorr(ev, lags=(1,)).collect()
    assert rows[0]["r_q9"] == 0


def test_spike_replica(spark):
    series = {0: 2, 1: 2, 2: 20, 3: 2, 4: 2}
    ev = _events(spark, series)
    rows = rate_spike_topk(ev, k=2).collect()
    cnts = [series[h] for h in range(5)]
    n, s, s2 = 5, sum(cnts), sum(c * c for c in cnts)
    want_top = math.floor((n * 20 - s) / math.sqrt(n * s2 - s * s) * 1e6 + 0.5)
    assert rows[0]["cnt"] == 20 and rows[0]["z_q6"] == want_top
    assert rows[0]["z_q6"] > 0 > rows[1]["z_q6"] or rows[1]["z_q6"] <= rows[0]["z_q6"]


def test_validation(spark):
    ev = _events(spark, {0: 1})
    with pytest.raises(ValueError):
        periodicity_autocorr(ev, lags=())
    with pytest.raises(ValueError):
        rate_spike_topk(ev, k=0)
