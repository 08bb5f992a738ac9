"""Temporal log analytics over the events table: periodicity and rate
anomalies — the traffic-shape audits a crawl/query log gets before
capacity planning and recrawl scheduling.

* ``hourly_counts`` — the shared dense hourly series (missing hours
  materialized as zero, or the lag algebra silently skips gaps).
* ``periodicity_autocorr`` — lag-L autocorrelation of the hourly
  event-count series (the diurnal-cycle check: web traffic shows
  r(24) >> r(1) when a daily period exists; Kleinberg KDD'02 frames
  burst/periodic structure detection over exactly such streams).
  Pearson r over the (c_t, c_{t+L}) pair series computed from INTEGER
  moments — the only float ops are the final one-expression division
  and sqrt, so the q9 quantization is engine-stable.
* ``rate_spike_topk`` — per-hour z-score from the same integer
  moments: z_t = (n·c_t - S) / sqrt(n·S2 - S²), the standard spike
  detector; top hours by quantized z.

All shapes are one groupBy plus single-row moment aggregates joined
back — no window over the raw events, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Dense (hour, cnt) series, zero-filled between the observed min
    and max hour.  hour = days-since-epoch * 24 + hour-of-day — field
    extraction rather than an epoch cast, so the bucket is identical
    for TIMESTAMP and TIMESTAMP_NTZ columns and independent of any
    session timezone (the epoch-cast route is tz-dependent and Spark 4
    refuses it on NTZ outright)."""
    hrs = events.select(
        (
            F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")) * F.lit(24)
            + F.hour(F.col(ts_col))
        ).cast("long").alias("hour")
    )
    cnt = hrs.groupBy("hour").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    rng = hrs.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    full = rng.select(F.explode(F.sequence("lo", "hi")).alias("hour"))
    return full.join(cnt, "hour", "left").select(
        "hour", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )


def periodicity_autocorr(
    events: DataFrame, lags=(1, 24), ts_col: str = "ts"
) -> DataFrame:
    """Per lag L: (lag, n_pairs, sx, sy, sxy, sx2, sy2, r_q9) with
    r = (n·sxy - sx·sy) / sqrt((n·sx2 - sx²)·(n·sy2 - sy²)); r_q9 = 0
    when either variance term is 0 (constant series)."""
    lags = sorted(set(int(x) for x in lags))
    if not lags or lags[0] < 1:
        raise ValueError("lags must be positive")
    hc = hourly_counts(events, ts_col)
    lag_df = events.sparkSession.createDataFrame([(x,) for x in lags], "lag long")
    a = hc.select(F.col("hour").alias("h"), F.col("cnt").alias("x"))
    b = hc.select(F.col("hour").alias("h2"), F.col("cnt").alias("y"))
    pairs = (
        lag_df.crossJoin(a)
        .join(b, F.col("h2") == F.col("h") + F.col("lag"))
    )
    mo = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sy2"),
    )
    vx = F.col("n_pairs") * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    r_q9 = F.when(
        (vx > 0) & (vy > 0),
        F.floor(
            num / F.sqrt(vx.cast("double") * vy.cast("double")) * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return mo.select("lag", "n_pairs", "sx", "sy", "sxy", "sx2", "sy2", r_q9.alias("r_q9"))


def rate_spike_topk(events: DataFrame, k: int = 5, ts_col: str = "ts") -> DataFrame:
    """Top-k spike hours by z-score: (hour, cnt, z_q6), z computed
    from the whole-series integer moments in one expression."""
    if k < 1:
        raise ValueError("k must be >= 1")
    hc = hourly_counts(events, ts_col)
    mo = hc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    j = hc.crossJoin(F.broadcast(mo))
    var = F.col("n") * F.col("s2") - F.col("s") * F.col("s")
    z_q6 = F.when(
        var > 0,
        F.floor(
            (F.col("n") * F.col("cnt") - F.col("s")).cast("double")
            / F.sqrt(var.cast("double"))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.select("hour", "cnt", z_q6.alias("z_q6"))
        .orderBy(F.desc("z_q6"), F.asc("hour"))
        .limit(k)
    )


def kleinberg_burst(
    events: DataFrame, s: float = 3.0, gamma: float = 1.0, ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Kleinberg two-state burst detection (Kleinberg, "Bursty and
    hierarchical structure in streams", KDD 2002) per event class: a
    base state q0 emits inter-arrival gaps at rate λ0 = n/T, the burst
    state q1 at rate s·λ0; entering q1 costs γ·ln n.  The optimal state
    sequence minimizes Σ fit costs + transition costs (Viterbi).

    Determinism: per-gap fit costs −ln λ + λ·gap are each ONE double
    expression quantized to q6 BIGINTs, the transition cost likewise —
    the Viterbi min/plus DP then runs entirely on integers inside one
    sequential F.aggregate fold per key (and a recursive CTE replays the
    identical integer recurrence in the oracle).  Gaps are integer
    seconds from timezone-free field extraction (see hourly_counts).

    Output per key: (key, n_gaps, trans_q6, final_cost_q6,
    burst_steps) — burst_steps counts DP steps where the burst state is
    strictly cheaper, a backtrack-free burstiness diagnostic.  Keys
    with fewer than 2 events (no gaps) or zero time span are dropped.
    """
    if s <= 1.0 or gamma <= 0.0:
        raise ValueError("s must be > 1 and gamma > 0")
    sec = (
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01")).cast("long") * F.lit(86400)
        + F.hour(F.col(ts_col)).cast("long") * F.lit(3600)
        + F.minute(F.col(ts_col)).cast("long") * F.lit(60)
        + F.second(F.col(ts_col)).cast("long")
    )
    base = events.select(F.col(key_col).alias("key"), sec.alias("t"))
    per = base.groupBy("key").agg(
        F.array_sort(F.collect_list("t")).alias("ts"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).filter(F.col("n") >= 2)
    span = (F.element_at("ts", -1) - F.element_at("ts", 1)).cast("double")
    per = per.withColumn("span", span).filter(F.col("span") > 0)
    lam0 = F.col("n").cast("double") / F.col("span")
    lam1 = F.lit(float(s)) * lam0
    # gaps[i] = ts[i+1] - ts[i]; per-gap integer fit costs for both states
    gaps = F.expr("transform(slice(ts, 2, size(ts) - 1), (x, i) -> x - element_at(ts, i + 1))")
    per = per.withColumn("gaps", gaps).withColumn("lam0", lam0).withColumn("lam1", lam1)

    def _fq(lam, gap_col):
        return F.floor(
            (-F.log(lam) + lam * gap_col.cast("double")) * F.lit(1e6) + F.lit(0.5)
        ).cast("long")

    costs = F.transform(
        F.col("gaps"),
        lambda g: F.struct(
            _fq(F.col("lam0"), g).alias("f0"), _fq(F.col("lam1"), g).alias("f1")
        ),
    )
    trans_q = F.floor(
        F.lit(float(gamma)) * F.log(F.col("n").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    per = per.withColumn("costs", costs).withColumn("trans_q6", trans_q)
    big = F.lit(10**15).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("c0"), big.alias("c1"),
        F.lit(0).cast("long").alias("b"),
    )

    def step(acc, x):
        c0n = F.least(acc.c0, acc.c1) + x.f0
        c1n = F.least(acc.c0 + F.col("trans_q6"), acc.c1) + x.f1
        return F.struct(
            c0n.alias("c0"), c1n.alias("c1"),
            (acc.b + F.when(c1n < c0n, 1).otherwise(0)).alias("b"),
        )

    dp = F.aggregate(F.col("costs"), init, step)
    return per.select(
        F.col("key").alias(key_col),
        (F.col("n") - 1).cast("long").alias("n_gaps"),
        "trans_q6",
        F.least(dp.c0, dp.c1).cast("long").alias("final_cost_q6"),
        dp.b.cast("long").alias("burst_steps"),
    )


def cusum_alarms(
    events: DataFrame, k_slack_ppm: int = 250_000, h_mult_ppm: int = 4_000_000,
    ts_col: str = "ts",
) -> DataFrame:
    """One-sided CUSUM changepoint detection (Page, "Continuous
    inspection schemes", Biometrika 1954) over the hourly count series:

        S_t = max(0, S_{t-1} + (c_t - mu - k))

    alarming when S_t > h, with slack k = k_slack_ppm/1e6 * mu and
    threshold h = h_mult_ppm/1e6 * mu.  To keep the recurrence EXACT,
    everything is scaled by n*1e6 (mu = S/n): the integer recurrence

        T_t = max(0, T_{t-1} + 1e6*n*c_t - 1e6*S - k_ppm*S)

    runs in one sequential F.aggregate fold, alarms where
    T_t > h_ppm * S * ... (same scale).  Output one row per alarm hour:
    (hour, cnt, cusum_scaled) — empty when the series never drifts.
    """
    if k_slack_ppm < 0 or h_mult_ppm <= 0:
        raise ValueError("k_slack_ppm must be >= 0 and h_mult_ppm > 0")
    hc = hourly_counts(events, ts_col)
    mo = hc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
    )
    # array_sort(collect_list(struct)) — NOT orderBy + collect_list, whose
    # order is not guaranteed once partial-agg buffers merge (struct sort
    # keys on its first field, hour); same discipline as every other
    # sequential fold in this module (ewma/kleinberg/kaplan_meier)
    series = hc.agg(
        F.array_sort(F.collect_list(F.struct("hour", "cnt"))).alias("xs")
    ).crossJoin(F.broadcast(mo))
    # per-step increment in the n*1e6 scale; threshold likewise
    inc = lambda c: (  # noqa: E731
        F.lit(1_000_000) * F.col("n") * c - F.lit(1_000_000) * F.col("s")
        - F.lit(int(k_slack_ppm)) * F.col("s")
    )
    thr = F.lit(int(h_mult_ppm)) * F.col("s")
    init = F.expr("CAST(array() AS ARRAY<STRUCT<hour: BIGINT, cnt: BIGINT, cusum_scaled: BIGINT>>)")
    zero = F.lit(0).cast("long")

    def step(acc, x):
        prev = F.when(F.size(acc) > 0, F.element_at(acc, -1).cusum_scaled).otherwise(zero)
        t = F.greatest(zero, prev + inc(x.cnt.cast("long")))
        return F.concat(
            acc,
            F.array(F.struct(
                x.hour.alias("hour"), x.cnt.cast("long").alias("cnt"),
                t.alias("cusum_scaled"),
            )),
        )

    walked = series.select(
        F.aggregate(F.expr("xs"), init, step).alias("walk"), thr.alias("thr")
    )
    ex = walked.select(F.explode("walk").alias("w"), "thr")
    return ex.filter(F.col("w.cusum_scaled") > F.col("thr")).select(
        F.col("w.hour").alias("hour"),
        F.col("w.cnt").alias("cnt"),
        F.col("w.cusum_scaled").alias("cusum_scaled"),
    )


def ewma_residual_topk(
    events: DataFrame, k: int = 10, alpha_num: int = 1, alpha_den: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """EWMA (exponentially-weighted moving average, the Roberts 1959
    control-chart smoother) over the dense hourly count series, with the
    k largest one-step-ahead residuals — the standard ops anomaly feed.

    Quantize-before-fold: the smoothed state is held in q6 integers and
    advanced by the DEFINED recurrence

        s_t = (alpha_num * cnt_t * 10^6 + (alpha_den - alpha_num) * s_{t-1})
              // alpha_den         (s_0 = cnt_0 * 10^6)

    so the whole curve is exact bigint arithmetic on any engine (the
    Kleinberg-burst / Kaplan-Meier pattern).  The residual at t is
    cnt_t*10^6 - s_{t-1} (actual minus prior prediction).  Output
    (hour, cnt, pred_q6, resid_q6) for the top-k hours by
    (|resid| DESC, hour ASC); hour 0 (no prior state) is excluded.
    """
    if not 0 < alpha_num < alpha_den:
        raise ValueError("need 0 < alpha_num < alpha_den")
    hc = hourly_counts(events, ts_col=ts_col)
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("hour").alias("h"), F.col("cnt").alias("c")))
    )
    q = 1_000_000
    init = F.struct(
        F.lit(-1).cast("long").alias("s"),
        F.expr(
            "CAST(array() AS ARRAY<STRUCT<h: BIGINT, c: BIGINT, p: BIGINT, r: BIGINT>>)"
        ).alias("rows"),
    )

    def _step(acc, x):
        first = acc["s"] < 0
        a = (
            F.lit(alpha_num) * x["c"] * F.lit(q)
            + F.lit(alpha_den - alpha_num) * acc["s"]
        )
        nxt = F.when(first, x["c"] * F.lit(q)).otherwise(
            ((a - F.pmod(a, F.lit(alpha_den))) / F.lit(alpha_den)).cast("long")
        )
        row = F.struct(
            x["h"].alias("h"),
            x["c"].alias("c"),
            acc["s"].alias("p"),
            (x["c"] * F.lit(q) - acc["s"]).alias("r"),
        )
        rows = F.when(first, acc["rows"]).otherwise(
            F.concat(acc["rows"], F.array(row))
        )
        return F.struct(nxt.alias("s"), rows.alias("rows"))

    folded = hc.agg(arr.alias("arr")).select(
        F.explode(F.aggregate(F.col("arr"), init, _step)["rows"]).alias("r")
    )
    return (
        folded.select(
            F.col("r.h").alias("hour"),
            F.col("r.c").alias("cnt"),
            F.col("r.p").alias("pred_q6"),
            F.col("r.r").alias("resid_q6"),
        )
        .orderBy(F.desc(F.abs(F.col("resid_q6"))), F.asc("hour"))
        .limit(k)
    )


def daily_trend_ols(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Ordinary-least-squares linear trend of the daily event-count
    series: x = day offset from the first observed day, y = count.
    All moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact integer sums; the
    slope, intercept and r² close in ONE double expression each from
    those integers:

        slope     = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²)
        intercept = (ΣyΣx² - ΣxΣxy) / (nΣx² - (Σx)²)
        r²        = (nΣxy - ΣxΣy)² / ((nΣx² - (Σx)²)(nΣy² - (Σy)²))

    Output one row: (n_days, slope_q6, intercept_q6, r2_q6) — missing
    days count as zero (dense series), so the trend is over the true
    calendar axis.
    """
    days = events.select(
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
        .cast("long")
        .alias("day")
    )
    cnt = days.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    rng = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    dense = (
        rng.select(F.explode(F.sequence("lo", "hi")).alias("day"))
        .join(cnt, "day", "left")
        .select(
            "day", F.coalesce("cnt", F.lit(0)).cast("long").alias("y")
        )
        .crossJoin(F.broadcast(rng.select(F.col("lo"))))
        .select((F.col("day") - F.col("lo")).cast("long").alias("x"), "y")
    )
    m = dense.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")

    def _q6(expr):
        return F.floor(expr * F.lit(1e6) + F.lit(0.5)).cast("long")

    slope = F.when(dx > 0, _q6(num.cast("double") / dx.cast("double"))).otherwise(
        F.lit(0).cast("long")
    )
    intercept = F.when(
        dx > 0,
        _q6(
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
            / dx.cast("double")
        ),
    ).otherwise(F.lit(0).cast("long"))
    r2 = F.when(
        (dx > 0) & (dy > 0),
        _q6(
            num.cast("double")
            * num.cast("double")
            / (dx * dy).cast("double")
        ),
    ).otherwise(F.lit(0).cast("long"))
    return m.select(
        F.col("n").alias("n_days"),
        slope.alias("slope_q6"),
        intercept.alias("intercept_q6"),
        r2.alias("r2_q6"),
    )


def mann_kendall_trend(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Mann-Kendall monotonic-trend test (Mann 1945; Kendall 1975) over
    the dense daily event-count series — the nonparametric companion to
    daily_trend_ols (no linearity assumption, robust to outliers).

        S = sum_{i<j} sign(y_j - y_i)            (exact integer)
        var*18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)   (exact integer)
        z = (S -/+ 1) / sqrt(var)  (continuity-corrected; 0 when S = 0)

    Output one row: (n_days, s_stat, var18, z_q6) — only the closing z
    runs in double (one expression over two exact integers).
    """
    days = events.select(
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
        .cast("long")
        .alias("day")
    )
    cnt = days.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("y"))
    rng = days.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    dense = (
        rng.select(F.explode(F.sequence("lo", "hi")).alias("day"))
        .join(cnt, "day", "left")
        .select("day", F.coalesce("y", F.lit(0)).cast("long").alias("y"))
    )
    a = dense.select(F.col("day").alias("di"), F.col("y").alias("yi"))
    b = dense.select(F.col("day").alias("dj"), F.col("y").alias("yj"))
    s = (
        a.join(b, F.col("di") < F.col("dj"))
        .agg(
            F.coalesce(F.sum(F.signum(F.col("yj") - F.col("yi"))), F.lit(0.0))
            .cast("long")
            .alias("s_stat")
        )
    )
    nrow = dense.agg(F.count("*").cast("long").alias("n"))
    tie = (
        dense.groupBy("y")
        .agg(F.count("*").cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - F.lit(1))
                    * (F.lit(2) * F.col("t") + F.lit(5))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tt")
        )
    )
    m = nrow.crossJoin(s).crossJoin(tie)
    var18 = (
        F.col("n") * (F.col("n") - F.lit(1)) * (F.lit(2) * F.col("n") + F.lit(5))
        - F.col("tt")
    )
    corrected = F.when(F.col("s_stat") > 0, F.col("s_stat") - F.lit(1)).otherwise(
        F.when(F.col("s_stat") < 0, F.col("s_stat") + F.lit(1)).otherwise(F.lit(0))
    )
    z = F.when(
        (var18 > 0) & (F.col("s_stat") != 0),
        F.floor(
            corrected.cast("double")
            / F.sqrt(var18.cast("double") / F.lit(18.0))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return m.select(
        F.col("n").alias("n_days"),
        "s_stat",
        var18.cast("long").alias("var18"),
        z.alias("z_q6"),
    )


def dow_seasonality(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Day-of-week seasonality audit: event counts per weekday (0 =
    Monday .. 6 = Sunday, from the tz-free epoch-day arithmetic
    (day + 3) % 7 — 1970-01-01 was a Thursday) with the chi-square
    contribution against the uniform expectation total/7.  Counts are
    exact bigints; expected and contribution close in one double
    expression each.  Output rows dow 0..6:
    (dow, cnt, expected_q6, chi2_contrib_q6), zero-filled.
    """
    days = events.select(
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01"))
        .cast("long")
        .alias("day")
    )
    # Domain: POST-EPOCH timestamps only. (day + 3) % 7 with Spark's
    # truncated % mirrors the DuckDB oracle's identical expression; for
    # pre-1970 days both engines would produce negative remainders outside
    # the 0..6 buckets (counted in n but not in cnt). pmod would fix the
    # engine alone but diverge from the frozen oracle, so the domain is
    # documented instead. Same domain note applies to cohort_retention's
    # (day / period_days) truncation.
    per = days.select(((F.col("day") + F.lit(3)) % 7).alias("dow")).groupBy(
        "dow"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = days.agg(F.count("*").cast("long").alias("n"))
    base = (
        tot.select(
            F.explode(F.array(*[F.lit(d) for d in range(7)])).alias("dow"), "n"
        )
        .join(per, "dow", "left")
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
            "n",
        )
    )
    exp = F.col("n").cast("double") / F.lit(7.0)
    chi = (F.col("cnt").cast("double") - exp) * (F.col("cnt").cast("double") - exp) / exp
    return base.select(
        "dow",
        "cnt",
        F.floor(exp * F.lit(1e6) + F.lit(0.5)).cast("long").alias("expected_q6"),
        F.when(
            F.col("n") > 0,
            F.floor(chi * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("chi2_contrib_q6"),
    ).orderBy(F.asc("dow"))
