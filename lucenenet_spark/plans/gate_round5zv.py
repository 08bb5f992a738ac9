"""Gate registry round-5 part zv: anytime impact-budget evaluation and
two-stage LM smoothing.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# impact_budget_topk — Anh & Moffat SIGIR'06: stop after the 300
# highest-impact postings across the OR terms; exact_overlap audits
# the latency cap.  The prefix rule is a total order, so both engines
# take the identical 300 rows.
# ----------------------------------------------------------------------
_IB_TERMS = ("vector", "merge")
_IB_BUDGET = 300
_IB_K = 10

_IB_CONTRIB = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, '{t}' AS term,"
    f" CAST(floor(score * 10000 + 0.5) AS BIGINT) AS c_q FROM ({_tsc(t)})"
    for t in _IB_TERMS
)

_IB_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
contrib AS (
{_IB_CONTRIB}
),
pref AS (
  SELECT doc_id, c_q FROM (
    SELECT doc_id, c_q,
           row_number() OVER (ORDER BY c_q DESC, doc_id ASC, term ASC) AS p
    FROM contrib) WHERE p <= {_IB_BUDGET}
),
page AS (
  SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT)
           AS rank, doc_id, score_q
  FROM (SELECT doc_id, CAST(sum(c_q) AS BIGINT) AS score_q FROM pref GROUP BY 1)
  QUALIFY rank <= {_IB_K}
),
gtop AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY sq DESC, doc_id ASC) AS g
    FROM (SELECT doc_id, CAST(sum(c_q) AS BIGINT) AS sq FROM contrib GROUP BY 1))
  WHERE g <= {_IB_K}
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_overlap
  FROM page JOIN gtop USING (doc_id)
)
SELECT p.rank, p.doc_id, p.score_q, ov.exact_overlap FROM page p, ov
"""


@gate("impact_budget_topk", _IB_SQL)
def impact_budget_topk(spark, sf_dir):
    """OR top-10 under a 300-posting impact budget with exact audit."""
    from lucenenet_spark.search.accumulators import impact_budget_topk as _ib

    _, s, _ = get_engine(spark, sf_dir)
    return _ib(s, _IB_TERMS, budget=_IB_BUDGET, k=_IB_K)


# ----------------------------------------------------------------------
# two_stage_lm_term — Zhai & Lafferty SIGIR'02: Dirichlet (document
# estimation) composed with Jelinek-Mercer (query noise), mu=2000
# lambda=0.1.
# ----------------------------------------------------------------------
_TL_TERM = "merge"
_TL_MU = 2000.0
_TL_LAM = 0.1

_TL_SQL = SQL_PRELUDE + f"""
SELECT p.doc_id,
       CAST(floor(ln(
         {1.0 - _TL_LAM!r} * ((p.tf + {_TL_MU!r} * (ts.ttf / cs.sttf))
                              / (dl.dl + {_TL_MU!r}))
         + {_TL_LAM!r} * (ts.ttf / cs.sttf)
       ) * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = '{_TL_TERM}'
"""


@gate("two_stage_lm_term", _TL_SQL)
def two_stage_lm_term(spark, sf_dir):
    """Two-stage smoothed LM scores for docs matching one term."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.similarities import two_stage_lm_scored

    idx, _, _ = get_engine(spark, sf_dir)
    scored = two_stage_lm_scored(idx, _TL_TERM, mu=_TL_MU, lam=_TL_LAM)
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )
