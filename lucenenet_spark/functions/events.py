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


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9, as fixed
# literals so both engines compare against the SAME constants (engine
# log() may differ in the last ulp).
BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_digits(
    events: DataFrame,
    event_type: str = "purchase",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Benford's-law first-significant-digit audit (Benford 1938; the
    standard fraud/data-quality screen) over one event type's monetary
    values: the digit comes from the exact cent integer (floor(v*100 +
    0.5), then the leading character of its decimal string — no float
    log10), counts are exact, and the expected count and chi-square
    contribution close in one double expression each against the FIXED
    literal probabilities in BENFORD_P.  Output one row per digit 1..9:
    (digit, cnt, expected_q6, chi2_contrib_q6), zero-filled digits
    included.
    """
    cents = (
        events.filter(F.col(type_col) == event_type)
        .select(
            F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        .filter(F.col("cents") > 0)
    )
    digits = cents.select(
        F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
    )
    n_total = digits.agg(F.count("*").cast("long").alias("n"))
    counts = digits.groupBy("digit").agg(F.count("*").cast("long").alias("cnt"))
    base = (
        n_total.select(
            F.explode(F.array(*[F.lit(d) for d in range(1, 10)])).alias("digit"), "n"
        )
        .join(counts, "digit", "left")
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
            "n",
        )
    )
    p = F.element_at(
        F.array(*[F.lit(BENFORD_P[d]) for d in range(1, 10)]), F.col("digit").cast("int")
    )
    exp = F.col("n").cast("double") * p
    chi = (F.col("cnt").cast("double") - exp) * (F.col("cnt").cast("double") - exp) / exp
    return base.select(
        "digit",
        "cnt",
        F.floor(exp * F.lit(1e6) + F.lit(0.5)).cast("long").alias("expected_q6"),
        F.floor(chi * F.lit(1e6) + F.lit(0.5)).cast("long").alias("chi2_contrib_q6"),
    ).orderBy(F.asc("digit"))


def gini_activity(
    events: DataFrame, user_col: str = "user_id"
) -> DataFrame:
    """Gini coefficient of per-user event-count concentration (the
    Lorenz-curve inequality measure; traffic-concentration audit).
    With per-user counts x sorted ascending (ties by user id) and ranks
    i = 1..n:

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    — integer numerator and denominator, ONE double division, q6
    quantized.  Output one row: (n_users, total_events, gini_q6).
    """
    from pyspark.sql import Window

    per = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count("*").cast("long").alias("x")
    )
    w = Window.orderBy(F.asc("x"), F.asc("user_id"))
    ranked = per.withColumn("i", F.row_number().over(w).cast("long"))
    m = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
    )
    g = F.when(
        (F.col("n") > 0) & (F.col("sx") > 0),
        F.floor(
            (F.lit(2) * F.col("six") - (F.col("n") + F.lit(1)) * F.col("sx"))
            .cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return m.select(
        F.col("n").alias("n_users"),
        F.col("sx").alias("total_events"),
        g.alias("gini_q6"),
    )
