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
