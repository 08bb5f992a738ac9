"""Round-5 part-zzzi twins: cohort retention and RFM segmentation."""

from __future__ import annotations

import datetime
import math

from lucenenet_spark.functions.events import cohort_retention, rfm_segments

_EPOCH = datetime.date(1970, 1, 1)


def _ev(spark, rows):
    # rows: (user_id, day, event_type, value)
    data = [
        (
            i,
            datetime.datetime.combine(
                _EPOCH + datetime.timedelta(days=d), datetime.time(12, 0)
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


def _py_cohort(rows):
    first = {}
    for u, d, _, _ in rows:
        first[u] = min(first.get(u, d), d)
    cells = {}
    seen = set()
    for u, d, _, _ in rows:
        cw, w = first[u] // 7, d // 7
        key = (cw, w - cw)
        if (u, w) in seen:
            continue
        seen.add((u, w))
        cells[key] = cells.get(key, 0) + 1
    return sorted((cw, p, n) for (cw, p), n in cells.items())


def test_cohort_replica(spark):
    rows = [
        (1, 0, "view", 0.0), (1, 8, "view", 0.0), (1, 15, "view", 0.0),
        (2, 3, "view", 0.0), (2, 16, "view", 0.0),
        (3, 9, "view", 0.0), (3, 10, "view", 0.0),  # same week twice -> once
    ]
    got = [
        (r["cohort_week"], r["period"], r["users"])
        for r in cohort_retention(_ev(spark, rows)).collect()
    ]
    assert got == _py_cohort(rows)


def test_cohort_period0_is_cohort_size(spark):
    rows = [(u, 7 * u, "view", 0.0) for u in range(4)] + [
        (0, 14, "view", 0.0), (1, 14, "view", 0.0)
    ]
    got = {
        (r["cohort_week"], r["period"]): r["users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    # each user is their own weekly cohort; period-0 always present
    for u in range(4):
        assert got[(u, 0)] == 1


def _score(metrics, nb=5):
    # metrics: list of (metric, user_id); returns {user: score}
    order = sorted(metrics)
    n = len(order)
    return {u: (i * nb) // n + 1 for i, (_, u) in enumerate(order)}


def _py_rfm(rows):
    per = {}
    for u, d, t, v in rows:
        if t != "purchase":
            continue
        r, f, m = per.get(u, (-1, 0, 0))
        per[u] = (max(r, d), f + 1, m + math.floor(v * 100 + 0.5))
    rs = _score([(x[0], u) for u, x in per.items()])
    fs = _score([(x[1], u) for u, x in per.items()])
    ms = _score([(x[2], u) for u, x in per.items()])
    seg = {}
    for u in per:
        key = (rs[u], fs[u], ms[u])
        seg[key] = seg.get(key, 0) + 1
    return sorted((r, f, m, n) for (r, f, m), n in seg.items())


def test_rfm_replica(spark):
    rows = [
        (1, 5, "purchase", 10.00), (1, 40, "purchase", 2.50),
        (2, 50, "purchase", 99.99),
        (3, 20, "purchase", 1.00), (3, 21, "purchase", 1.00), (3, 22, "purchase", 1.00),
        (4, 60, "purchase", 5.25),
        (5, 2, "purchase", 300.10),
        (6, 33, "view", 1000.0),  # non-purchase ignored
        (7, 35, "purchase", 0.01),
    ]
    got = [
        (r["r_score"], r["f_score"], r["m_score"], r["users"])
        for r in rfm_segments(_ev(spark, rows)).collect()
    ]
    assert got == _py_rfm(rows)
    assert sum(x[3] for x in got) == 6  # users with purchases


def test_rfm_exact_quintiles_when_divisible(spark):
    # 10 users, distinct metrics -> exactly 2 per quintile per dimension
    rows = [(u, u, "purchase", float(u + 1)) for u in range(10)]
    got = rfm_segments(_ev(spark, rows)).collect()
    from collections import Counter

    rc = Counter()
    for r in got:
        rc[r["r_score"]] += r["users"]
    assert dict(rc) == {1: 2, 2: 2, 3: 2, 4: 2, 5: 2}
