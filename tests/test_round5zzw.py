"""Round-5 part-zzw twins: Kleinberg burst detection vs a Python
Viterbi replica."""

from __future__ import annotations

import datetime
import math

import pytest

from lucenenet_spark.functions.temporal import kleinberg_burst


def _events(spark, key_seconds):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for key, secs in key_seconds.items():
        for t in secs:
            rows.append((i, base + datetime.timedelta(seconds=t), key))
            i += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")


def _replica(secs, s=3.0, gamma=1.0):
    ts = sorted(secs)
    n = len(ts)
    span = ts[-1] - ts[0]
    lam0 = n / span
    lam1 = s * lam0
    gaps = [b - a for a, b in zip(ts, ts[1:])]

    def q(x):
        return math.floor(x * 1e6 + 0.5)

    trans = q(gamma * math.log(n))
    c0, c1, b = 0, 10**15, 0
    for g in gaps:
        f0 = q(-math.log(lam0) + lam0 * g)
        f1 = q(-math.log(lam1) + lam1 * g)
        c0n = min(c0, c1) + f0
        c1n = min(c0 + trans, c1) + f1
        if c1n < c0n:
            b += 1
        c0, c1 = c0n, c1n
    return len(gaps), trans, min(c0, c1), b


def test_burst_replica(spark):
    # 'bursty': long 100s gaps with a tight 1s-gap burst in the middle;
    # 'steady': uniform 60s gaps
    bursty = [0, 100, 200, 201, 202, 203, 204, 300, 400]
    steady = [60 * i for i in range(10)]
    ev = _events(spark, {"bursty": bursty, "steady": steady})
    rows = {r["event_type"]: r for r in kleinberg_burst(ev).collect()}
    for key, secs in (("bursty", bursty), ("steady", steady)):
        ng, tr, fc, b = _replica(secs)
        r = rows[key]
        assert (r["n_gaps"], r["trans_q6"], r["final_cost_q6"], r["burst_steps"]) == (
            ng, tr, fc, b,
        )
    assert rows["bursty"]["burst_steps"] > 0
    assert rows["steady"]["burst_steps"] == 0


def test_burst_skips_degenerate_keys(spark):
    ev = _events(spark, {"single": [5], "zero_span": [7, 7], "ok": [0, 10, 20]})
    keys = {r["event_type"] for r in kleinberg_burst(ev).collect()}
    assert keys == {"ok"}


def test_burst_validation(spark):
    ev = _events(spark, {"a": [0, 1, 2]})
    with pytest.raises(ValueError):
        kleinberg_burst(ev, s=1.0)
    with pytest.raises(ValueError):
        kleinberg_burst(ev, gamma=0.0)
