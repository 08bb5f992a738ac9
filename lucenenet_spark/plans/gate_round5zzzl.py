"""Gate registry round-5 part zzzl: Benford first-digit audit over
purchase amounts and the Gini coefficient of user-activity concentration.
"""

from __future__ import annotations

from lucenenet_spark.functions.events import BENFORD_P
from lucenenet_spark.plans.gate import gate

_BF_CASE = " ".join(
    f"WHEN {d} THEN {BENFORD_P[d]!r}" for d in range(1, 10)
)

_BF_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
pos AS (SELECT cents FROM cents WHERE cents > 0),
dg AS (
  SELECT CAST(left(CAST(cents AS VARCHAR), 1) AS BIGINT) AS digit FROM pos
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dg),
cnts AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM dg GROUP BY digit),
base AS (
  SELECT CAST(d.digit AS BIGINT) AS digit,
         CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt, nt.n,
         CASE d.digit {_BF_CASE} END AS p
  FROM (SELECT unnest(generate_series(1, 9)) AS digit) d
  LEFT JOIN cnts c USING (digit), nt
)
SELECT digit, cnt,
       CAST(floor(CAST(n AS DOUBLE) * p * 1000000 + 0.5) AS BIGINT)
         AS expected_q6,
       CAST(floor(
         (CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) * p)
         * (CAST(cnt AS DOUBLE) - CAST(n AS DOUBLE) * p)
         / (CAST(n AS DOUBLE) * p) * 1000000 + 0.5) AS BIGINT)
         AS chi2_contrib_q6
FROM base
ORDER BY digit ASC
"""


@gate("benford_digits", _BF_SQL)
def benford_digits_gate(spark, sf_dir):
    """First-significant-digit counts vs Benford expectations."""
    import os

    from lucenenet_spark.functions.events import benford_digits

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return benford_digits(ev, event_type="purchase")


_GINI_SQL = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
),
ranked AS (
  SELECT x, CAST(row_number() OVER (ORDER BY x ASC, user_id ASC) AS BIGINT) AS i
  FROM per
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(i * x) AS BIGINT) AS six
  FROM ranked
)
SELECT n AS n_users, sx AS total_events,
  CASE WHEN n > 0 AND sx > 0 THEN
    CAST(floor(CAST(2 * six - (n + 1) * sx AS DOUBLE)
               / CAST(n * sx AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS gini_q6
FROM m
"""


@gate("gini_activity", _GINI_SQL)
def gini_activity_gate(spark, sf_dir):
    """Gini coefficient of per-user event-count concentration."""
    import os

    from lucenenet_spark.functions.events import gini_activity

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return gini_activity(ev)
