"""Gate registry round-5 part zzzo: day-of-week seasonality chi-square
and conditional entropy of the event-type Markov chain.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_DOW_SQL = """
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day
  FROM events
),
per AS (
  SELECT (day + 3) % 7 AS dow, CAST(count(*) AS BIGINT) AS cnt
  FROM d GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
base AS (
  SELECT CAST(g.dow AS BIGINT) AS dow,
         CAST(coalesce(p.cnt, 0) AS BIGINT) AS cnt, tot.n
  FROM (SELECT unnest(generate_series(0, 6)) AS dow) g
  LEFT JOIN per p USING (dow), tot
)
SELECT dow, cnt,
       CAST(floor(CAST(n AS DOUBLE) / 7.0 * 1000000 + 0.5) AS BIGINT)
         AS expected_q6,
       CASE WHEN n > 0 THEN
         CAST(floor(
           (CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
           * (CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) / 7.0)
           / (CAST(n AS DOUBLE) / 7.0) * 1000000 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS chi2_contrib_q6
FROM base
ORDER BY dow ASC
"""


@gate("dow_seasonality", _DOW_SQL)
def dow_seasonality_gate(spark, sf_dir):
    """Weekday event counts vs the uniform expectation, per-dow chi2."""
    import os

    from lucenenet_spark.functions.temporal import dow_seasonality

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return dow_seasonality(ev)


_MCE_SQL = """
WITH seq AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS src
  FROM events
),
trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
rt AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS row_total FROM trans GROUP BY src),
cq AS (
  SELECT t.src, t.cnt,
         CAST(floor(CAST(t.cnt AS DOUBLE)
                    * ln(CAST(r.row_total AS DOUBLE) / CAST(t.cnt AS DOUBLE))
                    * 1000000000.0 + 0.5) AS BIGINT) AS c_q9
  FROM trans t JOIN rt r USING (src)
),
m AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_transitions,
         CAST(count(DISTINCT src) AS BIGINT) AS n_states,
         CAST(sum(c_q9) AS BIGINT) AS h_sum_q9
  FROM cq
)
SELECT n_transitions, n_states, h_sum_q9,
       CAST(h_sum_q9 // n_transitions AS BIGINT) AS h_cond_q9
FROM m
"""


@gate("markov_conditional_entropy", _MCE_SQL)
def markov_conditional_entropy_gate(spark, sf_dir):
    """H(next | current) of the per-user event-type chain."""
    import os

    from lucenenet_spark.functions.querylog import markov_conditional_entropy

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return markov_conditional_entropy(ev)
