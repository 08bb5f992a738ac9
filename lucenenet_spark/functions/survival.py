"""Survival analysis and contingency testing over the events table:
the product-limit (Kaplan-Meier) estimator for user-lifetime retention
and the Pearson chi-square 2x2 A/B test — the two classic hypothesis
shapes a product-analytics warehouse serves beside cohort_retention.

Determinism: the KM curve is a DEFINED integer recurrence,
s_q9(t) = s_q9(prev) * (n_t - d_t) // n_t starting from 10^9 (quantize-
before-fold, the Kleinberg-burst pattern), so every point is an exact
bigint on any engine; chi-square is integer cell counts with ONE
closing double expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.events import _day_col


def kaplan_meier(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    censor_window_days: int = 7,
) -> DataFrame:
    """Kaplan & Meier (JASA 1958) product-limit survival over user
    lifetimes: lifetime = last-event day - first-event day; a user whose
    last event falls within `censor_window_days` of the log's end is
    right-CENSORED (still alive when observation stopped), otherwise the
    lifetime is an observed death.  For each death time t:
    n_risk = users with lifetime >= t, deaths = observed deaths at t, and

        s_q9(t) = s_q9(prev) * (n_risk - deaths) // n_risk

    — the estimator's factor (1 - d/n) applied in integer q9 arithmetic
    (floor at every step; documented quantization, exact on any engine).
    Output (t, n_risk, deaths, s_q9) ordered by t.

    Scale: one groupBy(user) for lifetimes, one groupBy(t) for the death
    table, then a fold over the (tiny: distinct death times) collected
    per-t rows — the raw event stream is never windowed.
    """
    days = events.select(
        F.col(user_col).alias("user_id"), _day_col(ts_col).alias("day")
    )
    span = days.agg(F.max("day").alias("gmax"))
    users = (
        days.groupBy("user_id")
        .agg(F.min("day").alias("fd"), F.max("day").alias("ld"))
        .crossJoin(F.broadcast(span))
        .select(
            (F.col("ld") - F.col("fd")).cast("long").alias("life"),
            (F.col("ld") > F.col("gmax") - F.lit(censor_window_days)).alias(
                "censored"
            ),
        )
    )
    deaths = (
        users.filter(~F.col("censored"))
        .groupBy(F.col("life").alias("t"))
        .agg(F.count("*").cast("long").alias("deaths"))
    )
    # n_risk(t) = all users (censored or not) with lifetime >= t
    at_risk = users.select("life")
    n_risk = (
        deaths.join(
            at_risk, F.col("life") >= F.col("t"), "left"
        )
        .groupBy("t", "deaths")
        .agg(F.count("life").cast("long").alias("n_risk"))
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("t").alias("t"),
                F.col("n_risk").alias("n"),
                F.col("deaths").alias("d"),
            )
        )
    )
    init = F.struct(
        F.lit(1_000_000_000).cast("long").alias("s"),
        F.expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT, s: BIGINT>>)").alias("rows"),
    )

    def _step(acc, x):
        # exact integer division: A - (A mod n) is divisible, so the
        # double division is error-free (result representable + correctly
        # rounded) — a bare floor(A/n) can be off by one at the boundary
        a = acc["s"] * (x["n"] - x["d"])
        s2 = ((a - F.pmod(a, x["n"])) / x["n"]).cast("long")
        row = F.struct(
            x["t"].alias("t"), x["n"].alias("n"), x["d"].alias("d"), s2.alias("s")
        )
        return F.struct(
            s2.alias("s"), F.concat(acc["rows"], F.array(row)).alias("rows")
        )

    folded = n_risk.agg(arr.alias("arr")).select(
        F.explode(F.aggregate(F.col("arr"), init, _step)["rows"]).alias("r")
    )
    return folded.select(
        F.col("r.t").alias("t"),
        F.col("r.n").alias("n_risk"),
        F.col("r.d").alias("deaths"),
        F.col("r.s").alias("s_q9"),
    ).orderBy(F.asc("t"))


def ab_chi2(
    events: DataFrame,
    event_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    value_col: str = "value",
    min_value: float = 0.0,
) -> DataFrame:
    """Pearson chi-square independence test on the 2x2 table (pseudo-arm
    = user_id parity, outcome = user has >= 1 `event_type` event with value > min_value).  Cell
    counts are exact bigints; the statistic

        chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))

    is ONE double expression over them, quantized to q6.  Output one
    row: (a, b, c, d, chi2_q6) with a,b = arm-0 converted/not,
    c,d = arm-1 converted/not.
    """
    conv = (
        events.filter(
            (F.col(type_col) == event_type)
            & (F.col(value_col).cast("double") > F.lit(float(min_value)))
        )
        .select(F.col(user_col).alias("user_id"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    arms = (
        events.select(F.col(user_col).alias("user_id"))
        .distinct()
        .join(conv, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.coalesce("conv", F.lit(0)).alias("conv"),
        )
    )
    cells = arms.agg(
        F.sum(F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("conv") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    det = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    chi2 = F.when(
        den > 0,
        F.floor(
            n.cast("double")
            * det.cast("double")
            * det.cast("double")
            / den.cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return cells.select("a", "b", "c", "d", chi2.alias("chi2_q6"))
