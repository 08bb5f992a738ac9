"""Gate registry round-5 part zzzj: Kaplan-Meier survival over user
lifetimes and the Pearson chi-square 2x2 A/B test.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_KM_CENSOR = 1
# (the synthetic events table keeps every user active through the final
# week, so a 7-day window censors ALL of them — 0 rows; 1 day leaves a
# real mixed censored/uncensored curve at both gate SFs)

_KM_SQL = f"""
WITH RECURSIVE d AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events
),
span AS (SELECT max(day) AS gmax FROM d),
u AS (SELECT user_id, min(day) AS fd, max(day) AS ld FROM d GROUP BY user_id),
lives AS (
  SELECT CAST(ld - fd AS BIGINT) AS life,
         (ld > gmax - {_KM_CENSOR}) AS censored
  FROM u, span
),
death AS (
  SELECT life AS t, CAST(count(*) AS BIGINT) AS deaths
  FROM lives WHERE NOT censored GROUP BY life
),
risk AS (
  SELECT dd.t, dd.deaths,
         CAST((SELECT count(*) FROM lives l WHERE l.life >= dd.t) AS BIGINT)
           AS n_risk
  FROM death dd
),
ord AS (
  SELECT t, deaths, n_risk, row_number() OVER (ORDER BY t) AS rn FROM risk
),
km AS (
  SELECT rn, t, n_risk, deaths,
         CAST(1000000000 * (n_risk - deaths) // n_risk AS BIGINT) AS s
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.t, o.n_risk, o.deaths,
         CAST(km.s * (o.n_risk - o.deaths) // o.n_risk AS BIGINT)
  FROM km JOIN ord o ON o.rn = km.rn + 1
)
SELECT t, n_risk, deaths, s AS s_q9 FROM km ORDER BY t ASC
"""


@gate("kaplan_meier", _KM_SQL)
def kaplan_meier_gate(spark, sf_dir):
    """Product-limit survival of user lifetimes, 7-day right censoring."""
    import os

    from lucenenet_spark.functions.survival import kaplan_meier

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return kaplan_meier(ev, censor_window_days=_KM_CENSOR)


_AB_SQL = """
WITH conv AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150.0
),
arms AS (
  SELECT u.user_id % 2 AS arm,
         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN conv c USING (user_id)
),
cells AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM arms
)
SELECT a, b, c, d,
  CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) > 0 THEN
    CAST(floor(
      CAST(a + b + c + d AS DOUBLE)
      * CAST(a * d - b * c AS DOUBLE)
      * CAST(a * d - b * c AS DOUBLE)
      / CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE)
      * 1000000 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS chi2_q6
FROM cells
"""


@gate("ab_chi2_test", _AB_SQL)
def ab_chi2_test(spark, sf_dir):
    """Pearson chi-square: (user parity) x (purchase over $150) table."""
    import os

    from lucenenet_spark.functions.survival import ab_chi2

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ab_chi2(ev, event_type="purchase", min_value=150.0)
