"""Gate registry round-5 part zzzg: AP-weighted rank correlation
(tau_ap) and Spearman rho/footrule between BM25 and Classic rankings.
Completes the rank-agreement family (kendall_tau_rankings,
rbo_rank_overlap) with the top-weighted and displacement-based
coefficients.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_RC_K = 10


def _rankings_sql(term: str) -> str:
    """Shared CTE block: ra = BM25 top-10 rank, rb = Classic top-10 rank
    (replicating TFIDFSimilarity double mode as in kendall_tau_rankings),
    bo = conjoint docs re-ranked 1..m per side."""
    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS ra
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(term)})
  ) QUALIFY ra <= {_RC_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{term}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rb
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{term}'
  ) QUALIFY rb <= {_RC_K}
),
bo AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ra) AS ref,
         row_number() OVER (ORDER BY rb) AS obs
  FROM (SELECT ra.doc_id, ra.ra, rb.rb FROM ra JOIN rb USING (doc_id))
)"""
    )


# ----------------------------------------------------------------------
# tau_ap_rankings — Yilmaz/Aslam/Robertson SIGIR'08 AP correlation:
# top-weighted agreement of the Classic ordering with the BM25 ordering.
# LCM(1..9)=2520 scales each C(i)/(i-1) to an exact bigint sum.
# ----------------------------------------------------------------------
_TAP_TERM = "window"

_TAP_SQL = _rankings_sql(_TAP_TERM) + f""",
c AS (
  SELECT a.obs AS i, CAST(count(*) AS BIGINT) AS conc
  FROM bo a JOIN bo b ON b.obs < a.obs AND b.ref < a.ref
  WHERE a.obs >= 2
  GROUP BY a.obs
),
s AS (
  SELECT CAST(coalesce(sum(conc * (2520 // (i - 1))), 0) AS BIGINT) AS s_lcm FROM c
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM bo)
SELECT mm.n_common, s.s_lcm,
       CASE WHEN mm.n_common >= 2 THEN
         CAST(floor(
           (2.0 * s.s_lcm / ((mm.n_common - 1) * 2520.0) - 1.0)
           * 1000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS tau_ap_q6
FROM mm, s
"""


@gate("tau_ap_rankings", _TAP_SQL)
def tau_ap_rankings(spark, sf_dir):
    """tau_ap of the Classic vs BM25 top-10 for one query term."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.quality import tau_ap
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_TAP_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _RC_K)
            .select("doc_id", "rank")
        )

    return tau_ap(_ranked(searcher), _ranked(classic), k=_RC_K)


# ----------------------------------------------------------------------
# spearman_rankings — Spearman rho (no-ties closed form over squared
# rank displacements) + footrule between the same ranking pair.
# ----------------------------------------------------------------------
_SPR_TERM = "scan"

_SPR_SQL = _rankings_sql(_SPR_TERM) + """,
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common,
         CAST(coalesce(sum((ref - obs) * (ref - obs)), 0) AS BIGINT) AS sum_d2,
         CAST(coalesce(sum(abs(ref - obs)), 0) AS BIGINT) AS footrule
  FROM bo
)
SELECT n_common, sum_d2, footrule,
       CASE WHEN n_common >= 2 THEN
         CAST(floor(
           (1.0 - 6.0 * sum_d2 / CAST(n_common * (n_common * n_common - 1) AS DOUBLE))
           * 1000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS rho_q6
FROM agg
"""


@gate("spearman_rankings", _SPR_SQL)
def spearman_rankings(spark, sf_dir):
    """Spearman rho + footrule of Classic vs BM25 top-10."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.quality import spearman_rho
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_SPR_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _RC_K)
            .select("doc_id", "rank")
        )

    return spearman_rho(_ranked(searcher), _ranked(classic), k=_RC_K)
