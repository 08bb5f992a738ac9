"""Gate registry round-5 part zq: two classical ranking models closing
the similarity seam — pivoted-normalization VSM and DFI.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# pivoted_vsm_term — Singhal SIGIR'96 Lnu.ltu single-term scoring,
# slope 0.2.
# ----------------------------------------------------------------------
_PV_TERM = "merge"
_PV_S = 0.2

_PV_SQL = SQL_PRELUDE + f"""
SELECT p.doc_id,
       CAST(floor(
         (1.0 + ln(1.0 + ln(p.tf)))
         / ({1.0 - _PV_S!r} + {_PV_S!r} * dl.dl / (cs.sttf / cs.n))
         * ln((cs.n + 1.0) / ts.df)
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = '{_PV_TERM}'
"""


@gate("pivoted_vsm_term", _PV_SQL)
def pivoted_vsm_term(spark, sf_dir):
    """Pivoted-normalization scores for all docs matching one term."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.similarities import pivoted_norm_scored

    idx, _, _ = get_engine(spark, sf_dir)
    scored = pivoted_norm_scored(idx, _PV_TERM, slope=_PV_S)
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )


# ----------------------------------------------------------------------
# dfi_term_query — Kocabaş/Dinçer/Karaoğlan IR'14 standardized
# divergence from independence; docs at/below chance tf score 0 and
# are dropped.
# ----------------------------------------------------------------------
_DFI_TERM = "vector"

_DFI_SQL = SQL_PRELUDE + f"""
SELECT doc_id,
       CAST(floor(ln((tf - e) / sqrt(e) + 1.0) / ln(2.0) * 10000 + 0.5)
            AS BIGINT) AS score_q
FROM (
  SELECT p.doc_id, CAST(p.tf AS DOUBLE) AS tf,
         (ts.ttf + 1.0) * dl.dl / (cs.sttf + 1.0) AS e
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term = '{_DFI_TERM}'
)
WHERE tf > e
"""


@gate("dfi_term_query", _DFI_SQL)
def dfi_term_query(spark, sf_dir):
    """DFI (standardized) scores for docs beating chance frequency."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.similarities import dfi_scored

    idx, _, _ = get_engine(spark, sf_dir)
    scored = dfi_scored(idx, _DFI_TERM)
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )
