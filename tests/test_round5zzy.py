"""Round-5 part-zzy twins: CUSUM changepoints and session Markov
transitions."""

from __future__ import annotations

import datetime

import pytest

from lucenenet_spark.functions.querylog import event_markov_transitions
from lucenenet_spark.functions.temporal import cusum_alarms


def _events_hours(spark, hour_counts):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for h, n in hour_counts.items():
        for _ in range(n):
            rows.append((i, base + datetime.timedelta(hours=h, minutes=i % 55)))
            i += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def _cusum_replica(counts, k_ppm, h_ppm):
    n = len(counts)
    s = sum(counts)
    t, alarms = 0, []
    for i, c in enumerate(counts):
        t = max(0, t + 1_000_000 * n * c - 1_000_000 * s - k_ppm * s)
        if t > h_ppm * s:
            alarms.append((i, c, t))
    return alarms


def test_cusum_detects_level_shift(spark):
    # 8 calm hours then 4 elevated ones -> drift accumulates and alarms
    series = {h: 2 for h in range(8)}
    series.update({h: 12 for h in range(8, 12)})
    ev = _events_hours(spark, series)
    got = sorted(
        (r["cnt"], r["cusum_scaled"])
        for r in cusum_alarms(ev, k_slack_ppm=250_000, h_mult_ppm=1_000_000).collect()
    )
    counts = [series[h] for h in range(12)]
    want = sorted((c, t) for _, c, t in _cusum_replica(counts, 250_000, 1_000_000))
    assert got == want
    assert len(got) == 3  # the level shift IS detected (hours 9-11)


def test_cusum_flat_series_no_alarms(spark):
    ev = _events_hours(spark, {h: 5 for h in range(10)})
    assert cusum_alarms(ev).count() == 0


def test_cusum_validation(spark):
    ev = _events_hours(spark, {0: 1, 1: 1})
    with pytest.raises(ValueError):
        cusum_alarms(ev, k_slack_ppm=-1)
    with pytest.raises(ValueError):
        cusum_alarms(ev, h_mult_ppm=0)


def _events_seq(spark, user_seqs):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for user, seq in user_seqs.items():
        for j, et in enumerate(seq):
            rows.append((i, base + datetime.timedelta(minutes=j), user, et))
            i += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_markov_replica(spark):
    seqs = {
        1: ["view", "view", "click", "buy"],
        2: ["view", "click", "view"],
        3: ["buy"],  # no transitions
    }
    ev = _events_seq(spark, seqs)
    rows = {(r["src"], r["dst"]): r for r in event_markov_transitions(ev, k=20).collect()}
    want = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert {k: r["cnt"] for k, r in rows.items()} == want
    # row-normalization: transitions out of 'view' = 3 total
    # (view->view, view->click from user 1; view->click from user 2)
    assert rows[("view", "click")]["row_total"] == 3
    assert rows[("view", "click")]["prob_q6"] == 666_667
    assert rows[("view", "view")]["prob_q6"] == 333_333


def test_markov_transitions_respect_user_boundaries(spark):
    # last event of user 1 must NOT chain into first event of user 2
    seqs = {1: ["a", "b"], 2: ["c", "d"]}
    ev = _events_seq(spark, seqs)
    keys = {(r["src"], r["dst"]) for r in event_markov_transitions(ev, k=10).collect()}
    assert keys == {("a", "b"), ("c", "d")}


def test_markov_validation(spark):
    ev = _events_seq(spark, {1: ["a", "b"]})
    with pytest.raises(ValueError):
        event_markov_transitions(ev, k=0)
