"""Gate registry round-5 part zo: bounded-memory query evaluation and
query-performance prediction — Moffat-Zobel accumulator limiting and
WIG/NQC.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _tsc,
    gate,
    get_engine,
)

# ----------------------------------------------------------------------
# accumulator_limit_topk — Moffat & Zobel TOIS'96 continue strategy:
# L=60 accumulators, rarest term first; admission replayed in the
# oracle by the same declarative (first_term_rank, first_contrib, doc)
# ordering.
# ----------------------------------------------------------------------
_AL_TERMS = ("vector", "merge", "query")
_AL_L = 60
_AL_K = 10

_AL_TERMS_IN = ", ".join(f"'{t}'" for t in _AL_TERMS)
_AL_CONTRIB = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, '{t}' AS term,"
    f" CAST(floor(score * 10000 + 0.5) AS BIGINT) AS c_q FROM ({_tsc(t)})"
    for t in _AL_TERMS
)

_AL_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
tsch AS (
  SELECT term, CAST(row_number() OVER (ORDER BY df ASC, term ASC) AS BIGINT) AS term_rank
  FROM ts WHERE term IN ({_AL_TERMS_IN})
),
contrib AS (
{_AL_CONTRIB}
),
cj AS (SELECT c.doc_id, c.c_q, s.term_rank FROM contrib c JOIN tsch s USING (term)),
firstr AS (SELECT doc_id, min(term_rank) AS first_term_rank FROM cj GROUP BY 1),
firstc AS (
  SELECT f.doc_id, f.first_term_rank, c.c_q AS first_c_q
  FROM firstr f JOIN cj c ON c.doc_id = f.doc_id AND c.term_rank = f.first_term_rank
),
adm AS (
  SELECT doc_id, first_term_rank FROM (
    SELECT doc_id, first_term_rank,
           row_number() OVER (ORDER BY first_term_rank ASC, first_c_q DESC,
                              doc_id ASC) AS a
    FROM firstc) WHERE a <= {_AL_L}
),
tot AS (
  SELECT a.doc_id, CAST(a.first_term_rank AS BIGINT) AS first_term_rank,
         CAST(sum(c.c_q) AS BIGINT) AS score_q
  FROM adm a JOIN cj c USING (doc_id) GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, first_term_rank, score_q
FROM tot
QUALIFY rank <= {_AL_K}
"""


@gate("accumulator_limit_topk", _AL_SQL)
def accumulator_limit_topk(spark, sf_dir):
    """OR top-10 under a 60-accumulator budget, continue strategy."""
    from lucenenet_spark.search.accumulators import accumulator_limited_topk

    _, s, _ = get_engine(spark, sf_dir)
    return accumulator_limited_topk(s, _AL_TERMS, limit=_AL_L, k=_AL_K)


# ----------------------------------------------------------------------
# wig_nqc_qpp — Zhou & Croft SIGIR'07 WIG + Shtok ICTIR'09 NQC over the
# 'vector' top-10; sums exact in q4 ints, one sqrt/divide at the end.
# ----------------------------------------------------------------------
_QPP_TERM = "vector"
_QPP_K = 10

_QPP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
rkd AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS s_q
  FROM ({_tsc(_QPP_TERM)})
),
top AS (
  SELECT s_q FROM (
    SELECT s_q, row_number() OVER (ORDER BY s_q DESC, doc_id ASC) AS r FROM rkd)
  WHERE r <= {_QPP_K}
),
corp AS (
  SELECT CAST(floor(
    ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * CAST(ts.ttf AS DOUBLE)
    / (CAST(ts.ttf AS DOUBLE) + 1.2 * (0.25 + 0.75 * cs.n)) * 10000 + 0.5)
    AS BIGINT) AS s_corpus_q4
  FROM ts, cs WHERE ts.term = '{_QPP_TERM}'
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS k_eff, CAST(sum(s_q) AS BIGINT) AS sum_s,
         CAST(sum(s_q * s_q) AS BIGINT) AS sum_s2
  FROM top
)
SELECT k_eff, s_corpus_q4,
       CAST(sum_s - k_eff * s_corpus_q4 AS BIGINT) AS wig_sum_q4,
       CAST(floor(sqrt(CAST(k_eff * sum_s2 - sum_s * sum_s AS DOUBLE))
                  / (CAST(k_eff AS DOUBLE) * CAST(s_corpus_q4 AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS nqc_q6
FROM a, corp
"""


@gate("wig_nqc_qpp", _QPP_SQL)
def wig_nqc_qpp(spark, sf_dir):
    """WIG and NQC performance predictors for the 'vector' query."""
    from lucenenet_spark.search.quality import wig_nqc_qpp as _qpp

    _, s, _ = get_engine(spark, sf_dir)
    return _qpp(s, _QPP_TERM, k=_QPP_K)
