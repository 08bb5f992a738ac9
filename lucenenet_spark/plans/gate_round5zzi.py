"""Gate registry round-5 part zzi: pre-retrieval query-performance
prediction (He & Ounis SPIRE'04, SCQ from Zhao et al. ECIR'08) and the
axiomatic retrieval functions F2EXP / F2LOG (Fang & Zhai SIGIR'05).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# preretrieval_qpp — per-term idf/ictf/SCQ + query scope, no retrieval
# run; the OOV third term must surface with df=cf=0 and NULL predictors.
# ----------------------------------------------------------------------
_QP_TERMS = ("vector", "query", "zzznosuchterm")
_QP_IN = ", ".join(f"'{t}'" for t in _QP_TERMS)

_QP_SQL = SQL_PRELUDE + f""",
q AS (SELECT unnest([{_QP_IN}]) AS term),
st AS (SELECT q.term, ts.df, ts.ttf FROM q LEFT JOIN ts USING (term)),
sco AS (
  SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_any
  FROM post WHERE term IN ({_QP_IN})
)
SELECT st.term,
       CAST(coalesce(st.df, 0) AS BIGINT) AS df,
       CAST(coalesce(st.ttf, 0) AS BIGINT) AS cf,
       coalesce(CASE WHEN st.df > 0 THEN
         CAST(floor(ln(cs.n / st.df) * 1000000000.0 + 0.5) AS BIGINT) END,
         -1) AS idf_q9,
       coalesce(CASE WHEN st.df > 0 THEN
         CAST(floor(ln(cs.sttf / st.ttf) * 1000000000.0 + 0.5) AS BIGINT) END,
         -1) AS ictf_q9,
       coalesce(CASE WHEN st.df > 0 THEN
         CAST(floor((1 + ln(st.ttf)) * ln(1 + cs.n / st.df)
              * 1000000000.0 + 0.5) AS BIGINT) END,
         -1) AS scq_q9,
       CAST(floor(-ln(s.n_any / cs.n) * 1000000000.0 + 0.5) AS BIGINT) AS scope_q9
FROM st, sco s, cs
"""


@gate("preretrieval_qpp", _QP_SQL)
def preretrieval_qpp(spark, sf_dir):
    """Pre-retrieval predictors for a 3-term query (one term OOV).

    The module returns NULL predictors for OOV terms; the gate maps
    them to a -1 sentinel because the correctness comparator cannot
    equate NULL floats (NaN != NaN)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.quality import preretrieval_qpp as _pq

    idx, _, _ = get_engine(spark, sf_dir)
    out = _pq(idx, list(_QP_TERMS))
    return out.select(
        "term", "df", "cf",
        *[
            F.coalesce(F.col(c), F.lit(-1)).cast("long").alias(c)
            for c in ("idf_q9", "ictf_q9", "scq_q9", "scope_q9")
        ],
    )


# ----------------------------------------------------------------------
# axiomatic_f2exp_term — single-term F2EXP top-15.
# ----------------------------------------------------------------------
_AX_TERM = "stream"


def _ax_term_sql(idf_expr: str, term: str) -> str:
    return f"""
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT p.doc_id,
         {idf_expr} * p.tf / (p.tf + 0.5 + 0.5 * dl.dl / (cs.sttf / cs.n)) AS score
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term = '{term}'
)
"""


_AE_SQL = SQL_PRELUDE + "," + f"""
base AS ({_ax_term_sql("pow(cs.n / ts.df, 0.35)", _AX_TERM)})
SELECT doc_id, score_q FROM base
ORDER BY score_q DESC, doc_id ASC LIMIT 15
"""


@gate("axiomatic_f2exp_term", _AE_SQL)
def axiomatic_f2exp_term(spark, sf_dir):
    """F2EXP(stream): (N/df)^0.35 idf shape, pivoted gamma."""
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.axiomatic import axiomatic_scored

    _, s, _ = get_engine(spark, sf_dir)
    scored = _spark_score_q(axiomatic_scored(s, [_AX_TERM], variant="f2exp"))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(15)


# ----------------------------------------------------------------------
# axiomatic_f2log_bool — two-term additive F2LOG top-15 (2-clause sum is
# commutative, so the double aggregation is order-stable).
# ----------------------------------------------------------------------
_AL_TERMS = ("group", "order")

_AL_SQL = SQL_PRELUDE + "," + f"""
u AS (
  SELECT doc_id,
         ln((cs.n + 1) / ts.df) * p.tf
           / (p.tf + 0.5 + 0.5 * dl.dl / (cs.sttf / cs.n)) AS score
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term IN ('{_AL_TERMS[0]}', '{_AL_TERMS[1]}')
)
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM u GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC LIMIT 15
"""


@gate("axiomatic_f2log_bool", _AL_SQL)
def axiomatic_f2log_bool(spark, sf_dir):
    """F2LOG(group OR order): ln((N+1)/df) idf shape, additive."""
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.axiomatic import axiomatic_scored

    _, s, _ = get_engine(spark, sf_dir)
    scored = _spark_score_q(axiomatic_scored(s, list(_AL_TERMS), variant="f2log"))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(15)
