"""Gate registry round-5 part zzzm: Mann-Whitney rank-sum A/B comparison
and the Mann-Kendall monotonic trend test.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_MW_SQL = """
WITH vals AS (
  SELECT user_id % 2 AS arm,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT arm, cents,
         CAST(rank() OVER (ORDER BY cents) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY cents) AS BIGINT) AS cnt_eq
  FROM vals
),
r2t AS (
  SELECT arm, CAST(2 * rk + cnt_eq - 1 AS BIGINT) AS r2 FROM ranked
),
ties AS (
  SELECT CAST(coalesce(sum(t * t * t - t), 0) AS BIGINT) AS tsum
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM vals GROUP BY cents)
),
m AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN arm = 0 THEN r2 ELSE 0 END) AS BIGINT) AS r1_x2
  FROM r2t
)
SELECT m.n1, m.n2, m.r1_x2,
       CAST(m.r1_x2 - m.n1 * (m.n1 + 1) AS BIGINT) AS u1_x2,
       CASE WHEN m.n1 > 0 AND m.n2 > 0 AND m.n1 + m.n2 > 1
                 AND (m.n1 + m.n2) * (m.n1 + m.n2 - 1) * (m.n1 + m.n2 + 1)
                     - ties.tsum > 0 THEN
         CAST(floor(
           CAST(m.r1_x2 - m.n1 * (m.n1 + 1) - m.n1 * m.n2 AS DOUBLE)
           / (2.0 * sqrt(
               CAST(m.n1 * m.n2 AS DOUBLE) / 12.0
               * (CAST(m.n1 + m.n2 + 1 AS DOUBLE)
                  - CAST(ties.tsum AS DOUBLE)
                    / CAST((m.n1 + m.n2) * (m.n1 + m.n2 - 1) AS DOUBLE))))
           * 1000000 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS z_q6
FROM m, ties
"""


@gate("mann_whitney_u", _MW_SQL)
def mann_whitney_u_gate(spark, sf_dir):
    """Rank-sum comparison of purchase values between user-parity arms."""
    import os

    from lucenenet_spark.functions.survival import mann_whitney_u

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return mann_whitney_u(ev, event_type="purchase")


_MK_SQL = """
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day
  FROM events
),
cnt AS (SELECT day, CAST(count(*) AS BIGINT) AS y FROM d GROUP BY day),
rng AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
dense AS (
  SELECT CAST(f.day AS BIGINT) AS day, CAST(coalesce(c.y, 0) AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(lo, hi)) AS day FROM rng) f
  LEFT JOIN cnt c USING (day)
),
s AS (
  SELECT CAST(coalesce(sum(CASE WHEN b.y > a.y THEN 1
                                WHEN b.y < a.y THEN -1 ELSE 0 END), 0) AS BIGINT)
           AS s_stat
  FROM dense a JOIN dense b ON a.day < b.day
),
nrow AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dense),
tie AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM dense GROUP BY y)
)
SELECT nrow.n AS n_days, s.s_stat,
       CAST(nrow.n * (nrow.n - 1) * (2 * nrow.n + 5) - tie.tt AS BIGINT) AS var18,
       CASE WHEN nrow.n * (nrow.n - 1) * (2 * nrow.n + 5) - tie.tt > 0
                 AND s.s_stat <> 0 THEN
         CAST(floor(
           CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                     ELSE s.s_stat + 1 END AS DOUBLE)
           / sqrt(CAST(nrow.n * (nrow.n - 1) * (2 * nrow.n + 5) - tie.tt
                       AS DOUBLE) / 18.0)
           * 1000000 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS z_q6
FROM nrow, s, tie
"""


@gate("mann_kendall_trend", _MK_SQL)
def mann_kendall_trend_gate(spark, sf_dir):
    """Mann-Kendall S/var/z over the dense daily event-count series."""
    import os

    from lucenenet_spark.functions.temporal import mann_kendall_trend

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return mann_kendall_trend(ev)
