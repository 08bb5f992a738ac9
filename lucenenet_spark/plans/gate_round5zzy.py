"""Gate registry round-5 part zzy: CUSUM changepoint alarms (Page 1954)
over the hourly series and the first-order session Markov transition
table.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5zzv import _HC_CTES

_CU_K_PPM = 250_000
_CU_H_PPM = 4_000_000

_CU_SQL = f"""
WITH RECURSIVE {_HC_CTES},
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s FROM hc
),
hs AS (
  SELECT hour, cnt, CAST(row_number() OVER (ORDER BY hour) AS BIGINT) AS i
  FROM hc
),
dp AS (
  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS t
  UNION ALL
  SELECT d.i + 1,
         greatest(CAST(0 AS BIGINT),
                  d.t + 1000000 * m.n * h.cnt - 1000000 * m.s
                  - {_CU_K_PPM} * m.s)
  FROM dp d JOIN hs h ON h.i = d.i + 1, mo m
)
SELECT h.hour, h.cnt, d.t AS cusum_scaled
FROM dp d JOIN hs h ON h.i = d.i, mo m
WHERE d.t > {_CU_H_PPM} * m.s
"""


@gate("cusum_changepoints", _CU_SQL)
def cusum_changepoints(spark, sf_dir):
    """CUSUM drift alarms over the hourly event-count series."""
    import os

    from lucenenet_spark.functions.temporal import cusum_alarms

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return cusum_alarms(ev, k_slack_ppm=_CU_K_PPM, h_mult_ppm=_CU_H_PPM)


# ----------------------------------------------------------------------
# event_markov_transitions — top-15 session transitions with row-
# normalized probabilities.
# ----------------------------------------------------------------------
_MK_K = 15

_MK_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS src
  FROM events
),
trans AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS cnt
  FROM seq WHERE src IS NOT NULL GROUP BY src, dst
),
rt AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS row_total FROM trans GROUP BY src)
SELECT t.src, t.dst, t.cnt, r.row_total,
       CAST(floor(CAST(t.cnt AS DOUBLE) / CAST(r.row_total AS DOUBLE)
            * 1000000.0 + 0.5) AS BIGINT) AS prob_q6
FROM trans t JOIN rt r USING (src)
ORDER BY cnt DESC, src ASC, dst ASC LIMIT {_MK_K}
"""


@gate("event_markov_transitions", _MK_SQL)
def event_markov_transitions(spark, sf_dir):
    """Per-user consecutive event-type transition table, top-15."""
    import os

    from lucenenet_spark.functions.querylog import event_markov_transitions as _mk

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _mk(ev, k=_MK_K)
