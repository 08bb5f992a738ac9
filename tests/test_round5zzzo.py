"""Round-5 part-zzzo twins: day-of-week seasonality and Markov H(Y|X)."""

from __future__ import annotations

import datetime
import math
from collections import Counter

from lucenenet_spark.functions.querylog import markov_conditional_entropy
from lucenenet_spark.functions.temporal import dow_seasonality

_EPOCH = datetime.date(1970, 1, 1)


def _ev(spark, rows):
    # rows: (user_id, day, event_type); event_id = list position
    data = [
        (
            i,
            datetime.datetime.combine(
                _EPOCH + datetime.timedelta(days=d), datetime.time(8, 0)
            ),
            u,
            t,
            0.0,
        )
        for i, (u, d, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _py_dow(days):
    n = len(days)
    c = Counter((d + 3) % 7 for d in days)
    out = []
    for dow in range(7):
        cnt = c.get(dow, 0)
        e = n / 7.0
        out.append(
            (
                dow,
                cnt,
                math.floor(e * 1e6 + 0.5),
                math.floor((cnt - e) * (cnt - e) / e * 1e6 + 0.5),
            )
        )
    return out


def test_dow_replica(spark):
    days = [0, 0, 1, 3, 7, 7, 7, 10, 11, 12]  # day 0 = Thursday (dow 3)
    rows = [(1, d, "view") for d in days]
    got = [
        (r["dow"], r["cnt"], r["expected_q6"], r["chi2_contrib_q6"])
        for r in dow_seasonality(_ev(spark, rows)).collect()
    ]
    assert got == _py_dow(days)


def test_dow_epoch_anchor_is_thursday(spark):
    rows = [(1, 0, "view")]  # 1970-01-01
    got = {r["dow"]: r["cnt"] for r in dow_seasonality(_ev(spark, rows)).collect()}
    assert got[3] == 1 and sum(got.values()) == 1


def _py_mce(rows):
    # rows ordered by insertion: (user, day, type); lag within user by
    # (ts, event_id) == insertion order here since ts increases with day
    byu = {}
    for i, (u, d, t) in enumerate(rows):
        byu.setdefault(u, []).append((d, i, t))
    trans = Counter()
    for u, evs in byu.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    rt = Counter()
    for (a, _), c in trans.items():
        rt[a] += c
    n = sum(trans.values())
    hsum = sum(
        math.floor(c * math.log(rt[a] / c) * 1e9 + 0.5) for (a, _), c in trans.items()
    )
    states = len(rt)
    return n, states, hsum, hsum // n


def test_mce_replica(spark):
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "view"), (1, 3, "purchase"),
        (2, 0, "view"), (2, 1, "view"), (2, 2, "click"),
        (3, 5, "signup"),
    ]
    r = markov_conditional_entropy(_ev(spark, rows)).collect()[0]
    assert (r["n_transitions"], r["n_states"], r["h_sum_q9"], r["h_cond_q9"]) == _py_mce(rows)


def test_mce_deterministic_chain_is_zero(spark):
    # view -> click -> view -> click...: every row of the chain is
    # deterministic, H(Y|X) = 0
    rows = [(1, d, "view" if d % 2 == 0 else "click") for d in range(8)]
    r = markov_conditional_entropy(_ev(spark, rows)).collect()[0]
    assert r["h_sum_q9"] == 0 and r["h_cond_q9"] == 0


def test_mce_uniform_two_way_is_ln2(spark):
    # from 'a', next is 'b' or 'c' equally often -> H = ln 2
    rows = [
        (1, 0, "a"), (1, 1, "b"),
        (2, 0, "a"), (2, 1, "c"),
    ]
    r = markov_conditional_entropy(_ev(spark, rows)).collect()[0]
    assert r["h_cond_q9"] == math.floor(math.log(2) * 1e9 + 0.5)
