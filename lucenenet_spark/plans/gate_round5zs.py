"""Gate registry round-5 part zs: proportional diversification (PM-2)
and click-entropy intent analysis.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_PM_TERM = "vector"
_PM_K = 10
_PM_N = 20
_PM_ASPECT = "source"

# ----------------------------------------------------------------------
# pm2_rerank — Dang & Croft SIGIR'12 Sainte-Laguë seat allocation over
# the source aspects; quotient is the single IEEE division, every other
# key integer.  Oracle replays the fold as a recursive CTE whose state
# carries seats INSIDE the candidate structs.
# ----------------------------------------------------------------------


def _pm2_sql() -> str:
    pre_rec = SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    return (
        pre_rec
        + ","
        + _SQL_SCORED
        + f""",
sc0 AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS s_q
  FROM ({_tsc(_PM_TERM)})
),
candr AS (
  SELECT doc_id, s_q, row_number() OVER (ORDER BY s_q DESC, doc_id ASC) AS rnk
  FROM sc0 QUALIFY rnk <= {_PM_N}
),
cand AS (
  SELECT c.rnk, c.doc_id, c.s_q, d.{_PM_ASPECT} AS aspect
  FROM candr c JOIN documents d USING (doc_id)
),
vt AS (SELECT aspect, CAST(count(*) AS BIGINT) AS votes FROM cand GROUP BY 1),
cl AS (
  SELECT list(struct_pack(doc_id := c.doc_id, s_q := c.s_q, aspect := c.aspect,
                          votes := v.votes, seats := CAST(0 AS BIGINT))
              ORDER BY c.rnk) AS l
  FROM cand c JOIN vt v USING (aspect)
),
pm(i, sel, st, od, oa, os) AS (
  SELECT 0, CAST([] AS BIGINT[]), cl.l,
         CAST([] AS BIGINT[]), CAST([] AS VARCHAR[]), CAST([] AS BIGINT[])
  FROM cl
  UNION ALL
  SELECT s.i + 1,
         list_append(s.sel, s.best.doc_id),
         list_transform(s.st, x -> struct_pack(
           doc_id := x.doc_id, s_q := x.s_q, aspect := x.aspect, votes := x.votes,
           seats := x.seats + CASE WHEN x.aspect = s.best.aspect
                                   THEN 1 ELSE 0 END)),
         list_append(s.od, s.best.doc_id),
         list_append(s.oa, s.best.aspect),
         list_append(s.os, s.best.seats + 1)
  FROM (
    SELECT q.i, q.sel, q.st, q.od, q.oa, q.os,
           list_sort(list_transform(
             list_filter(q.st, x -> NOT list_contains(q.sel, x.doc_id)),
             x -> struct_pack(
               negq := -(CAST(x.votes AS DOUBLE) / (2 * x.seats + 1)),
               aspect := x.aspect,
               negs := -x.s_q,
               doc_id := x.doc_id,
               seats := x.seats)))[1] AS best
    FROM (SELECT pm.* FROM pm WHERE pm.i < {_PM_K}) q
  ) s
  WHERE s.best IS NOT NULL
),
fin AS (SELECT od, oa, os FROM pm ORDER BY i DESC LIMIT 1)
SELECT CAST(generate_subscripts(od, 1) AS BIGINT) AS pos,
       unnest(od) AS doc_id,
       oa[generate_subscripts(od, 1)] AS aspect,
       CAST(os[generate_subscripts(od, 1)] AS BIGINT) AS seats_after
FROM fin
"""
    )


@gate("pm2_rerank", _pm2_sql())
def pm2_rerank(spark, sf_dir):
    """PM-2 proportional top-10 over the 'vector' candidates."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.diversify import pm2_rerank as _pm

    _, s, _ = get_engine(spark, sf_dir)
    return _pm(
        s, _docs_table(spark, sf_dir), _PM_TERM,
        k=_PM_K, n_candidates=_PM_N, aspect_col=_PM_ASPECT,
    )


# ----------------------------------------------------------------------
# click_entropy — Dou WWW'07 navigational/informational signal over the
# events log (event_type = query class, props integer = clicked item);
# per-class -p·ln p quantized q9 before the sum.
# ----------------------------------------------------------------------
_CE_SQL = """
WITH clicks AS (
  SELECT event_type, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS item
  FROM events
),
pi AS (
  SELECT event_type, item, CAST(count(*) AS BIGINT) AS c
  FROM clicks GROUP BY 1, 2
),
tt AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_clicks,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM pi GROUP BY 1
),
cb AS (
  SELECT p.event_type, t.n_clicks, t.n_distinct,
    CAST(floor(
      -(CAST(p.c AS DOUBLE) / CAST(t.n_clicks AS DOUBLE))
      * ln(CAST(p.c AS DOUBLE) / CAST(t.n_clicks AS DOUBLE))
      * 1000000000.0 + 0.5) AS BIGINT) AS h
  FROM pi p JOIN tt t USING (event_type)
)
SELECT event_type, n_clicks, n_distinct, CAST(sum(h) AS BIGINT) AS entropy_q9
FROM cb GROUP BY 1, 2, 3
"""


@gate("click_entropy", _CE_SQL)
def click_entropy(spark, sf_dir):
    """Click-distribution entropy per event_type query class."""
    import os

    from lucenenet_spark.functions.querylog import click_entropy as _ce

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return _ce(events)
