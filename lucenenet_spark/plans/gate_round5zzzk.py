"""Gate registry round-5 part zzzk: EWMA one-step-ahead anomaly
residuals over the hourly series and the OLS daily-count trend line.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_HC_CTES = """
hrs AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 24
         + hour(ts) AS BIGINT) AS hour
  FROM events
),
cnt AS (SELECT hour, CAST(count(*) AS BIGINT) AS cnt FROM hrs GROUP BY hour),
rng AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hrs),
fullh AS (SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS hour FROM rng),
hc AS (
  SELECT f.hour, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM fullh f LEFT JOIN cnt c USING (hour)
)"""

_EW_K = 10

# s_t = (1*cnt_t*1e6 + 3*s_{t-1}) // 4, s_0 = cnt_0*1e6; residual at t
# (t >= 1) is cnt_t*1e6 - s_{t-1}.
_EW_SQL = f"""
WITH RECURSIVE {_HC_CTES},
ord AS (SELECT hour, cnt, row_number() OVER (ORDER BY hour) AS rn FROM hc),
ew AS (
  SELECT rn, hour, cnt,
         CAST(cnt * 1000000 AS BIGINT) AS s,
         CAST(0 AS BIGINT) AS p, CAST(0 AS BIGINT) AS r
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.hour, o.cnt,
         CAST((1 * o.cnt * 1000000 + 3 * ew.s) // 4 AS BIGINT),
         ew.s,
         CAST(o.cnt * 1000000 - ew.s AS BIGINT)
  FROM ew JOIN ord o ON o.rn = ew.rn + 1
)
SELECT hour, cnt, CAST(p AS BIGINT) AS pred_q6, CAST(r AS BIGINT) AS resid_q6
FROM ew WHERE rn >= 2
ORDER BY abs(r) DESC, hour ASC LIMIT {_EW_K}
"""


@gate("ewma_anomaly", _EW_SQL)
def ewma_anomaly(spark, sf_dir):
    """Top-10 hourly EWMA (alpha=1/4) one-step-ahead residuals."""
    import os

    from lucenenet_spark.functions.temporal import ewma_residual_topk

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ewma_residual_topk(ev, k=_EW_K, alpha_num=1, alpha_den=4)


_OLS_SQL = """
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day
  FROM events
),
cnt AS (SELECT day, CAST(count(*) AS BIGINT) AS y FROM d GROUP BY day),
rng AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
dense AS (
  SELECT CAST(f.day - r.lo AS BIGINT) AS x,
         CAST(coalesce(c.y, 0) AS BIGINT) AS y
  FROM (SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS day FROM rng) f
  LEFT JOIN cnt c USING (day), rng r
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM dense
)
SELECT n AS n_days,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS slope_q6,
  CASE WHEN n * sxx - sx * sx > 0 THEN
    CAST(floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS intercept_q6,
  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
    CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)
               * 1000000 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS r2_q6
FROM m
"""


@gate("daily_trend_ols", _OLS_SQL)
def daily_trend_ols_gate(spark, sf_dir):
    """OLS slope/intercept/r2 of the dense daily event-count series."""
    import os

    from lucenenet_spark.functions.temporal import daily_trend_ols

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return daily_trend_ols(ev)
