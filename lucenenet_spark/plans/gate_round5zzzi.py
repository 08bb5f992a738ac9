"""Gate registry round-5 part zzzi: weekly cohort retention matrix and
RFM quintile segmentation over the events table.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

# ----------------------------------------------------------------------
# cohort_retention — users cohorted by first-event week (tz-free
# days-since-epoch // 7), cell = distinct cohort members active in
# cohort-relative week `period`.
# ----------------------------------------------------------------------
_COHORT_SQL = """
WITH d AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
  FROM events
),
f AS (
  SELECT user_id, CAST(min(day) // 7 AS BIGINT) AS cohort_week
  FROM d GROUP BY user_id
),
a AS (SELECT DISTINCT user_id, CAST(day // 7 AS BIGINT) AS week FROM d)
SELECT f.cohort_week,
       CAST(a.week - f.cohort_week AS BIGINT) AS period,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@gate("cohort_retention", _COHORT_SQL)
def cohort_retention_gate(spark, sf_dir):
    """Weekly cohort x period distinct-user retention matrix."""
    import os

    from lucenenet_spark.functions.events import cohort_retention

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return cohort_retention(ev, period_days=7)


# ----------------------------------------------------------------------
# rfm_segments — Hughes' RFM quintiles with the explicit integer bucket
# formula (no ntile): score = (rownum-1)*5 // n + 1 over the
# (metric ASC, user_id ASC) total order; cents quantized per event.
# ----------------------------------------------------------------------
_RFM_SQL = """
WITH p AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, CAST(max(day) AS BIGINT) AS r_day,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM p GROUP BY user_id
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
s AS (
  SELECT
    CAST((row_number() OVER (ORDER BY r_day ASC, user_id ASC) - 1) * 5
         // nn.n + 1 AS BIGINT) AS r_score,
    CAST((row_number() OVER (ORDER BY freq ASC, user_id ASC) - 1) * 5
         // nn.n + 1 AS BIGINT) AS f_score,
    CAST((row_number() OVER (ORDER BY cents ASC, user_id ASC) - 1) * 5
         // nn.n + 1 AS BIGINT) AS m_score
  FROM u, nn
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS users
FROM s GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


@gate("rfm_segments", _RFM_SQL)
def rfm_segments_gate(spark, sf_dir):
    """RFM quintile segment counts over purchase events."""
    import os

    from lucenenet_spark.functions.events import rfm_segments

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return rfm_segments(ev, event_type="purchase", n_buckets=5)
