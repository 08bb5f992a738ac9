"""Round-5 part-zzx twins: skyline docs and exact percentiles."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.search.collectors import score_percentiles, skyline_docs


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score_q long, n_chars long")


def _brute_skyline(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] >= a[1] and b[2] <= a[2] and (b[1] > a[1] or b[2] < a[2])
            for b in rows
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_replica(spark):
    rows = [
        (0, 100, 50),   # frontier
        (1, 90, 40),    # frontier (shorter)
        (2, 90, 60),    # dominated by 0
        (3, 100, 50),   # tie of 0: neither dominates -> both kept
        (4, 50, 10),    # frontier (shortest)
        (5, 40, 20),    # dominated by 4
    ]
    got = sorted(
        (r["doc_id"], r["score_q"], r["n_chars"])
        for r in skyline_docs(_frame(spark, rows), "score_q", "n_chars").collect()
    )
    assert got == _brute_skyline(rows)
    assert (3, 100, 50) in got  # exact ties both survive


def test_skyline_single_point(spark):
    rows = [(0, 10, 10), (1, 20, 5)]  # 1 dominates 0
    got = skyline_docs(_frame(spark, rows), "score_q", "n_chars").collect()
    assert [(r["doc_id"]) for r in got] == [1]


def test_percentiles_replica(spark):
    vals = [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]  # 1..10
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {r["pct"]: r for r in score_percentiles(df, "v", (50, 90, 100)).collect()}
    # nearest-rank: P50 -> rank ceil(5.0)=5 -> value 5; P90 -> rank 9; P100 -> 10
    assert rows[50]["value"] == 5
    assert rows[90]["value"] == 9
    assert rows[100]["value"] == 10
    assert all(r["n"] == 10 for r in rows.values())


def test_percentiles_odd_n(spark):
    df = spark.createDataFrame([(v,) for v in (10, 20, 30)], "v long")
    rows = {r["pct"]: r["value"] for r in score_percentiles(df, "v", (50, 99)).collect()}
    assert rows[50] == 20  # ceil(1.5) = 2
    assert rows[99] == 30  # ceil(2.97) = 3


def test_percentiles_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        score_percentiles(df, "v", ())
    with pytest.raises(ValueError):
        score_percentiles(df, "v", (0,))
    with pytest.raises(ValueError):
        score_percentiles(df, "v", (101,))
