"""User-level event analytics over the events table: cohort retention
and RFM segmentation — the two classic product-analytics rollups a
log warehouse serves beside the traffic-shape audits in temporal.py.

Determinism rules: all time bucketing is field-extraction days since
epoch (the tz-free idiom from temporal.hourly_counts — Spark 4 refuses
epoch casts on TIMESTAMP_NTZ); monetary values quantize per event
(floor(value*100+0.5) cents) BEFORE the integer sum, so every output
cell is an exact bigint with order-free aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _day_col(ts_col: str):
    return F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("long")


def cohort_retention(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period_days: int = 7,
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week of
    their FIRST event; cell (cohort_week, period) counts the distinct
    cohort members active period weeks later.  Output
    (cohort_week, period, users), ordered — period 0 is the cohort size.

    Scale: two groupBys over (user, week) pairs — the distinct-activity
    frame is bounded by users x weeks, far below the raw event count;
    no windows over raw events, no driver state.
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    days = events.select(
        F.col(user_col).alias("user_id"), _day_col(ts_col).alias("day")
    )
    first = days.groupBy("user_id").agg(
        (F.min("day") / F.lit(period_days)).cast("long").alias("cohort_week")
    )
    active = days.select(
        "user_id", (F.col("day") / F.lit(period_days)).cast("long").alias("week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).cast("long").alias("period"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("users"))
        .orderBy(F.asc("cohort_week"), F.asc("period"))
    )


def rfm_segments(
    events: DataFrame,
    event_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
    n_buckets: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation (Hughes,
    "Strategic Database Marketing", 1994) over one event type: per user,
    recency = last active day, frequency = event count, monetary = exact
    cent sum; each dimension scores 1..n_buckets by the explicit integer
    formula score = (rownum-1)*n_buckets // n + 1 over the
    (metric ASC, user_id ASC) total order — no ntile, so bucket edges
    are engine-identical.  Output one row per populated segment:
    (r_score, f_score, m_score, users), ordered.
    """
    from pyspark.sql import Window

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    per_user = (
        events.filter(F.col(type_col) == event_type)
        .select(
            F.col(user_col).alias("user_id"),
            _day_col(ts_col).alias("day"),
            F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.max("day").cast("long").alias("r_day"),
            F.count("*").cast("long").alias("freq"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    n = F.count("*").over(Window.partitionBy())

    def _score(metric: str):
        rn = F.row_number().over(Window.orderBy(F.asc(metric), F.asc("user_id")))
        return ((rn - F.lit(1)) * F.lit(n_buckets) / n).cast("long") + F.lit(1)

    scored = per_user.select(
        "user_id",
        _score("r_day").cast("long").alias("r_score"),
        _score("freq").cast("long").alias("f_score"),
        _score("cents").cast("long").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").cast("long").alias("users"))
        .orderBy(F.asc("r_score"), F.asc("f_score"), F.asc("m_score"))
    )
