"""Round-5 part-zzzj twins: Kaplan-Meier survival and 2x2 chi-square."""

from __future__ import annotations

import datetime
import math

from lucenenet_spark.functions.survival import ab_chi2, kaplan_meier

_EPOCH = datetime.date(1970, 1, 1)


def _ev(spark, rows):
    # rows: (user_id, day, event_type)
    data = [
        (
            i,
            datetime.datetime.combine(
                _EPOCH + datetime.timedelta(days=d), datetime.time(9, 0)
            ),
            u,
            t,
            1.0,
        )
        for i, (u, d, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _py_km(rows, censor=7):
    span = {}
    for u, d, _ in rows:
        lo, hi = span.get(u, (d, d))
        span[u] = (min(lo, d), max(hi, d))
    gmax = max(hi for _, hi in span.values())
    lives = [(hi - lo, hi > gmax - censor) for lo, hi in span.values()]
    deaths = {}
    for life, cen in lives:
        if not cen:
            deaths[life] = deaths.get(life, 0) + 1
    out, s = [], 10**9
    for t in sorted(deaths):
        n = sum(1 for life, _ in lives if life >= t)
        d = deaths[t]
        s = s * (n - d) // n
        out.append((t, n, d, s))
    return out


def test_km_replica(spark):
    # gmax = 30 -> users with last event > 23 are censored
    rows = (
        [(1, 0, "view"), (1, 5, "view")]        # life 5, dies
        + [(2, 0, "view"), (2, 5, "view")]      # life 5, dies
        + [(3, 0, "view"), (3, 12, "view")]     # life 12, dies
        + [(4, 2, "view"), (4, 30, "view")]     # censored (alive at end)
        + [(5, 10, "view")]                     # life 0, dies
        + [(6, 20, "view"), (6, 28, "view")]    # censored
    )
    got = [
        (r["t"], r["n_risk"], r["deaths"], r["s_q9"])
        for r in kaplan_meier(_ev(spark, rows)).collect()
    ]
    assert got == _py_km(rows)


def test_km_monotone_nonincreasing(spark):
    rows = [(u, 0, "view") for u in range(8)] + [
        (u, 3 + u, "view") for u in range(8)
    ]
    got = kaplan_meier(_ev(spark, rows), censor_window_days=0).collect()
    ss = [r["s_q9"] for r in got]
    assert ss == sorted(ss, reverse=True)
    assert all(r["deaths"] >= 1 for r in got)


def test_km_all_censored_is_empty(spark):
    rows = [(1, 0, "view"), (1, 10, "view"), (2, 9, "view")]
    got = kaplan_meier(_ev(spark, rows), censor_window_days=100).collect()
    assert got == []


def _py_chi2(rows):
    users = {u for u, _, _ in rows}
    conv = {u for u, _, t in rows if t == "purchase"}
    a = sum(1 for u in users if u % 2 == 0 and u in conv)
    b = sum(1 for u in users if u % 2 == 0 and u not in conv)
    c = sum(1 for u in users if u % 2 == 1 and u in conv)
    d = sum(1 for u in users if u % 2 == 1 and u not in conv)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = 0 if den == 0 else math.floor(
        float(a + b + c + d) * float(a * d - b * c) * float(a * d - b * c)
        / float(den) * 1e6 + 0.5
    )
    return a, b, c, d, chi2


def test_chi2_replica(spark):
    rows = [
        (0, 1, "purchase"), (2, 1, "view"), (4, 1, "purchase"), (6, 1, "view"),
        (1, 1, "view"), (3, 1, "view"), (5, 1, "purchase"), (7, 1, "view"),
        (0, 2, "purchase"),  # repeat purchase: still one converted user
    ]
    r = ab_chi2(_ev(spark, rows)).collect()[0]
    assert (r["a"], r["b"], r["c"], r["d"], r["chi2_q6"]) == _py_chi2(rows)


def test_chi2_independent_is_zero(spark):
    # identical conversion rate in both arms -> ad == bc -> chi2 = 0
    rows = [
        (0, 1, "purchase"), (2, 1, "view"),
        (1, 1, "purchase"), (3, 1, "view"),
    ]
    r = ab_chi2(_ev(spark, rows)).collect()[0]
    assert r["chi2_q6"] == 0 and (r["a"], r["b"], r["c"], r["d"]) == (1, 1, 1, 1)


def test_chi2_degenerate_margin_guard(spark):
    rows = [(0, 1, "view"), (2, 1, "view")]  # no arm-1 users, no conversions
    r = ab_chi2(_ev(spark, rows)).collect()[0]
    assert r["chi2_q6"] == 0
