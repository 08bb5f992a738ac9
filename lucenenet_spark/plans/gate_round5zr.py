"""Gate registry round-5 part zr: explicit-aspect diversification —
xQuAD re-ranking and subtopic recall.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_XQ_TERM = "vector"
_XQ_K = 10
_XQ_N = 20
_XQ_ASPECT = "source"

# ----------------------------------------------------------------------
# xquad_rerank — Santos WWW'10 at λ=0.5 / uniform priors / binary
# membership: integer priority |A|·s_d + s_max·[aspect uncovered].
# Oracle replays the same greedy fold as a recursive CTE carrying
# (sel, covered, out) list state — the team-draft discipline.
# ----------------------------------------------------------------------


def _xq_sql() -> str:
    pre_rec = SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    return (
        pre_rec
        + ","
        + _SQL_SCORED
        + f""",
sc0 AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS s_q
  FROM ({_tsc(_XQ_TERM)})
),
candr AS (
  SELECT doc_id, s_q, row_number() OVER (ORDER BY s_q DESC, doc_id ASC) AS rnk
  FROM sc0 QUALIFY rnk <= {_XQ_N}
),
cand AS (
  SELECT c.rnk, c.doc_id, c.s_q, d.{_XQ_ASPECT} AS aspect
  FROM candr c JOIN documents d USING (doc_id)
),
cl AS (
  SELECT list(struct_pack(doc_id := doc_id, s_q := s_q, aspect := aspect)
              ORDER BY rnk) AS l,
         CAST(count(DISTINCT aspect) AS BIGINT) AS na,
         CAST(max(CASE WHEN rnk = 1 THEN s_q END) AS BIGINT) AS smax
  FROM cand
),
xq(i, sel, covered, od, oa, op) AS (
  SELECT 0, CAST([] AS BIGINT[]), CAST([] AS VARCHAR[]),
         CAST([] AS BIGINT[]), CAST([] AS VARCHAR[]), CAST([] AS BIGINT[])
  UNION ALL
  SELECT s.i + 1,
         list_append(s.sel, s.best.doc_id),
         CASE WHEN list_contains(s.covered, s.best.aspect) THEN s.covered
              ELSE list_append(s.covered, s.best.aspect) END,
         list_append(s.od, s.best.doc_id),
         list_append(s.oa, s.best.aspect),
         list_append(s.op, -s.best.negp)
  FROM (
    SELECT q.i, q.sel, q.covered, q.od, q.oa, q.op,
           list_sort(list_transform(
             list_filter(q.l, x -> NOT list_contains(q.sel, x.doc_id)),
             x -> struct_pack(
               negp := -(q.na * x.s_q
                         + CASE WHEN list_contains(q.covered, x.aspect)
                                THEN 0 ELSE q.smax END),
               doc_id := x.doc_id, aspect := x.aspect)))[1] AS best
    FROM (SELECT xq.*, cl.l, cl.na, cl.smax FROM xq, cl
          WHERE xq.i < {_XQ_K}) q
  ) s
  WHERE s.best IS NOT NULL
),
fin AS (SELECT od, oa, op FROM xq ORDER BY i DESC LIMIT 1)
SELECT CAST(generate_subscripts(od, 1) AS BIGINT) AS pos,
       unnest(od) AS doc_id,
       oa[generate_subscripts(od, 1)] AS aspect,
       op[generate_subscripts(od, 1)] AS prio
FROM fin
"""
    )


@gate("xquad_rerank", _xq_sql())
def xquad_rerank(spark, sf_dir):
    """xQuAD top-10 over the 'vector' candidates, aspects = source."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.diversify import xquad_rerank as _xq

    _, s, _ = get_engine(spark, sf_dir)
    return _xq(
        s, _docs_table(spark, sf_dir), _XQ_TERM,
        k=_XQ_K, n_candidates=_XQ_N, aspect_col=_XQ_ASPECT,
    )


# ----------------------------------------------------------------------
# subtopic_recall — Zhai SIGIR'03 S-recall@10 of the PLAIN relevance
# ranking against the candidate pool's aspect set.
# ----------------------------------------------------------------------
_SR_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc0 AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS s_q
  FROM ({_tsc(_XQ_TERM)})
),
candr AS (
  SELECT doc_id, s_q, row_number() OVER (ORDER BY s_q DESC, doc_id ASC) AS rnk
  FROM sc0 QUALIFY rnk <= {_XQ_N}
),
cand AS (
  SELECT c.rnk, d.{_XQ_ASPECT} AS aspect
  FROM candr c JOIN documents d USING (doc_id)
)
SELECT CAST(sum(CASE WHEN rnk <= {_XQ_K} THEN 1 ELSE 0 END) AS BIGINT) AS k_eff,
       CAST(count(DISTINCT CASE WHEN rnk <= {_XQ_K} THEN aspect END) AS BIGINT)
         AS covered,
       CAST(count(DISTINCT aspect) AS BIGINT) AS n_aspects
FROM cand
"""


@gate("subtopic_recall", _SR_SQL)
def subtopic_recall(spark, sf_dir):
    """S-recall@10 components of the plain BM25 ranking."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.diversify import subtopic_recall as _sr

    _, s, _ = get_engine(spark, sf_dir)
    return _sr(
        s, _docs_table(spark, sf_dir), _XQ_TERM,
        k=_XQ_K, n_candidates=_XQ_N, aspect_col=_XQ_ASPECT,
    )
