"""Gate registry round-5 part zzw: Kleinberg two-state burst detection
(KDD'02) — integer-cost Viterbi per event class; the oracle replays the
identical integer recurrence through a recursive CTE.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_BD_S = 3.0
_BD_GAMMA = 1.0
_BD_BIG = 10**15

_BD_SQL = f"""
WITH RECURSIVE
ev AS (
  SELECT event_type AS key,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 86400
              + hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS BIGINT) AS t
  FROM events
),
st AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, min(t) AS mint, max(t) AS maxt
  FROM ev GROUP BY key
  HAVING count(*) >= 2 AND max(t) > min(t)
),
ord AS (
  SELECT key, t, row_number() OVER (PARTITION BY key ORDER BY t) AS rn FROM ev
),
gap AS (
  SELECT o.key, CAST(o.rn - 1 AS BIGINT) AS step, o.t - p.t AS gap
  FROM ord o
  JOIN ord p ON p.key = o.key AND p.rn = o.rn - 1
  JOIN st s ON s.key = o.key
),
lam AS (
  SELECT key, n, CAST(n AS DOUBLE) / CAST(maxt - mint AS DOUBLE) AS lam0 FROM st
),
cq AS (
  SELECT g.key, g.step,
         CAST(floor((-ln(l.lam0) + l.lam0 * CAST(g.gap AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT) AS f0,
         CAST(floor((-ln({_BD_S!r} * l.lam0)
              + {_BD_S!r} * l.lam0 * CAST(g.gap AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT) AS f1
  FROM gap g JOIN lam l USING (key)
),
tr AS (
  SELECT key, CAST(n - 1 AS BIGINT) AS n_gaps,
         CAST(floor({_BD_GAMMA!r} * ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS trans_q6
  FROM lam
),
dp AS (
  SELECT key, CAST(0 AS BIGINT) AS step, CAST(0 AS BIGINT) AS c0,
         CAST({_BD_BIG} AS BIGINT) AS c1, CAST(0 AS BIGINT) AS b
  FROM st
  UNION ALL
  SELECT d.key, d.step + 1,
         least(d.c0, d.c1) + c.f0,
         least(d.c0 + t.trans_q6, d.c1) + c.f1,
         d.b + CASE WHEN least(d.c0 + t.trans_q6, d.c1) + c.f1
                         < least(d.c0, d.c1) + c.f0
               THEN 1 ELSE 0 END
  FROM dp d
  JOIN cq c ON c.key = d.key AND c.step = d.step + 1
  JOIN tr t ON t.key = d.key
)
SELECT d.key AS event_type, t.n_gaps, t.trans_q6,
       least(d.c0, d.c1) AS final_cost_q6, d.b AS burst_steps
FROM dp d JOIN tr t ON t.key = d.key AND d.step = t.n_gaps
"""


@gate("burst_detection", _BD_SQL)
def burst_detection(spark, sf_dir):
    """Per-event-type burst DP over the events log (s=3, gamma=1)."""
    import os

    from lucenenet_spark.functions.temporal import kleinberg_burst

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return kleinberg_burst(ev, s=_BD_S, gamma=_BD_GAMMA)
