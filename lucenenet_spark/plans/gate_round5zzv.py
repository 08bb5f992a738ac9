"""Gate registry round-5 part zzv: temporal log analytics — hourly
autocorrelation (diurnal-period check) and z-score rate spikes, all
from integer moments.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_PA_LAGS = (1, 24)

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

_PA_SQL = f"""
WITH {_HC_CTES},
lg AS (SELECT CAST(unnest([{", ".join(str(x) for x in _PA_LAGS)}]) AS BIGINT) AS lag),
pairs AS (
  SELECT l.lag, a.cnt AS x, b.cnt AS y
  FROM lg l
  JOIN hc a ON true
  JOIN hc b ON b.hour = a.hour + l.lag
),
mo AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sx2, CAST(sum(y * y) AS BIGINT) AS sy2
  FROM pairs GROUP BY lag
)
SELECT lag, n_pairs, sx, sy, sxy, sx2, sy2,
       CASE WHEN n_pairs * sx2 - sx * sx > 0 AND n_pairs * sy2 - sy * sy > 0
       THEN CAST(floor(
         CAST(n_pairs * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n_pairs * sx2 - sx * sx AS DOUBLE)
                * CAST(n_pairs * sy2 - sy * sy AS DOUBLE))
         * 1000000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS r_q9
FROM mo
"""


@gate("periodicity_autocorr", _PA_SQL)
def periodicity_autocorr(spark, sf_dir):
    """Hourly-count autocorrelation at lags 1 and 24."""
    import os

    from lucenenet_spark.functions.temporal import periodicity_autocorr as _pa

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _pa(ev, lags=_PA_LAGS)


_RS_K = 5

_RS_SQL = f"""
WITH {_HC_CTES},
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s,
         CAST(sum(cnt * cnt) AS BIGINT) AS s2
  FROM hc
)
SELECT hour, cnt,
       CASE WHEN m.n * m.s2 - m.s * m.s > 0 THEN
         CAST(floor(CAST(m.n * cnt - m.s AS DOUBLE)
              / sqrt(CAST(m.n * m.s2 - m.s * m.s AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS z_q6
FROM hc, mo m
ORDER BY z_q6 DESC, hour ASC LIMIT {_RS_K}
"""


@gate("rate_spike_topk", _RS_SQL)
def rate_spike_topk(spark, sf_dir):
    """Top-5 spike hours by z-score."""
    import os

    from lucenenet_spark.functions.temporal import rate_spike_topk as _rs

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _rs(ev, k=_RS_K)
