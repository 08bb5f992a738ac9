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


def mann_whitney_u(
    events: DataFrame,
    event_type: str = "purchase",
    user_col: str = "user_id",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum, 1947) comparing the `value`
    distribution of one event type between the two pseudo-arms
    (user parity) — the nonparametric companion to ab_chi2.

    Exact integer core: values quantize to cents; tied ranks use the
    DOUBLED midrank r2 = min_rank + max_rank of the tie group (always
    integer), so 2*R1, 2*U1 and the tie-correction term
    T = sum(t^3 - t) are all bigints.  The normal-approximation z with
    tie-corrected variance

        z = (2*U1 - n1*n2) / (2 * sqrt(n1*n2/12 * ((n+1) - T/(n*(n-1)))))

    closes in ONE double expression, q6-quantized.  Output one row:
    (n1, n2, r1_x2, u1_x2, z_q6), arm 0 = even user ids.
    """
    from pyspark.sql import Window

    vals = events.filter(F.col(type_col) == event_type).select(
        (F.col(user_col) % 2).alias("arm"),
        F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.orderBy("cents")
    ranked = vals.withColumn("rk", F.rank().over(w).cast("long")).withColumn(
        "cnt_eq", F.count("*").over(Window.partitionBy("cents")).cast("long")
    )
    # doubled midrank of a tie group starting at rank rk with t members:
    # r2 = rk + (rk + t - 1) = 2*rk + t - 1
    r2 = (F.lit(2) * F.col("rk") + F.col("cnt_eq") - F.lit(1)).alias("r2")
    ranked = ranked.select("arm", "cents", r2)
    ties = (
        vals.groupBy("cents")
        .agg(F.count("*").cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")), F.lit(0)
            )
            .cast("long")
            .alias("tsum")
        )
    )
    m = ranked.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("arm") == 0, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r1_x2"),
    ).crossJoin(ties)
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + F.lit(1))
    n = F.col("n1") + F.col("n2")
    var = (
        (F.col("n1") * F.col("n2")).cast("double")
        / F.lit(12.0)
        * (
            (n + F.lit(1)).cast("double")
            - F.col("tsum").cast("double") / (n * (n - F.lit(1))).cast("double")
        )
    )
    # var > 0  <=>  n(n-1)(n+1) - tsum > 0 (exact integer condition; var
    # is 0 when EVERY value is tied, and ANSI mode raises on z's /0)
    var_pos = (n * (n - F.lit(1)) * (n + F.lit(1)) - F.col("tsum")) > 0
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (n > 1) & var_pos,
        F.floor(
            (u1_x2 - F.col("n1") * F.col("n2")).cast("double")
            / (F.lit(2.0) * F.sqrt(var))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return m.select(
        "n1", "n2", "r1_x2", u1_x2.cast("long").alias("u1_x2"), z.alias("z_q6")
    )
