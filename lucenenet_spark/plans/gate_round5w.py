"""Gate registry round-5 part w: IR-evaluation completion — ERR@k
(cascade model), Kendall tau between rankers, and bpref for
incompletely judged pools.  Together with trec_quality (P@k/MRR/AvP),
ndcg_topk, query_clarity and rbo_rank_overlap these cover the metric
suite a ranking team runs on every experiment.
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
# err_topk — Expected Reciprocal Rank (Chapelle et al. CIKM'09) over the
# BM25 top-10 with tf-derived grades (min(tf,4), as ndcg_topk).  The
# stop-probability products are exact integers (P_r = prod(16 - n_i)
# <= 16^9); the oracle carries them through a window product(), the
# Spark side through an F.aggregate fold — independent mechanisms, same
# integers, one IEEE division per rank, quantized 1e9, exact sum.
# ----------------------------------------------------------------------
_ERR_TERM = "vector"
_ERR_K = 10

_ERR_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
rkd AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_ERR_TERM)})
),
run AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM rkd QUALIFY rank <= {_ERR_K}
),
gr AS (
  SELECT r.rank, CAST(pow(2, least(p.tf, 4)) - 1 AS BIGINT) AS n
  FROM run r JOIN post p USING (doc_id) WHERE p.term = '{_ERR_TERM}'
),
pr AS (
  SELECT rank, n,
         coalesce(product(CAST(16 - n AS DOUBLE)) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0) AS p
  FROM gr
)
SELECT CAST({_ERR_K} AS BIGINT) AS k,
       CAST(sum(CAST(floor(
         CAST(n AS DOUBLE) * p
         / (CAST(rank AS DOUBLE) * CAST(CAST(1 AS BIGINT) << (4 * rank) AS DOUBLE))
         * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS err_q9
FROM pr
"""


@gate("err_topk", _ERR_SQL)
def err_topk(spark, sf_dir):
    """ERR@10 under the cascade user model, graded qrels from tf."""
    from lucenenet_spark.search.quality import err_at_k

    _, s, _ = get_engine(spark, sf_dir)
    return err_at_k(s, _ERR_TERM, k=_ERR_K)


# ----------------------------------------------------------------------
# kendall_tau_rankings — tau-a between the BM25 and ClassicSimilarity
# top-10 for the same query, over the conjoint documents (exact integer
# concordant/discordant pair counts; RBO covers the non-conjoint part).
# The classic-side ranking SQL replicates TFIDFSimilarity double-mode
# (sqrt(tf) · idf² · queryNorm · 1/sqrt(dl)) as in rbo_rank_overlap.
# ----------------------------------------------------------------------
_TAU_TERM = "vector"
_TAU_K = 10


def _tau_sql() -> str:
    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS ra
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_TAU_TERM)})
  ) QUALIFY ra <= {_TAU_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_TAU_TERM}'
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
    WHERE p.term = '{_TAU_TERM}'
  ) QUALIFY rb <= {_TAU_K}
),
bo AS (SELECT ra.doc_id, ra.ra, rb.rb FROM ra JOIN rb USING (doc_id)),
pairs AS (
  SELECT CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0 THEN 1 ELSE 0 END AS c,
         CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0 THEN 1 ELSE 0 END AS d
  FROM bo x JOIN bo y ON x.doc_id < y.doc_id
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM bo)
SELECT mm.n_common,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS concordant,
       CAST(coalesce(sum(d), 0) AS BIGINT) AS discordant,
       CASE WHEN mm.n_common >= 2 THEN
         CAST(floor(
           (coalesce(sum(c), 0) - coalesce(sum(d), 0))
           / (mm.n_common * (mm.n_common - 1) / 2.0)
           * 1000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS tau_q6
FROM pairs, mm GROUP BY mm.n_common
"""
    )


@gate("kendall_tau_rankings", _tau_sql())
def kendall_tau_rankings(spark, sf_dir):
    """Kendall tau-a between BM25 and Classic top-10 rankings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.quality import kendall_tau
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_TAU_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return scored.withColumn("rank", F.row_number().over(w))

    return kendall_tau(_ranked(searcher), _ranked(classic), k=_TAU_K)


# ----------------------------------------------------------------------
# bpref_eval — Buckley & Voorhees SIGIR'04 binary preference over the
# corpus-convention judged pool (matching docs are judged; relevant iff
# tf >= 2).  Exact integer nonrel-above counts via one window over the
# <= k-row run; contributions quantized 1e9, final 1/R in double.
# ----------------------------------------------------------------------
_BPREF_TERM = "query"
_BPREF_K = 10
_BPREF_MIN_TF = 2

_BPREF_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_BPREF_MIN_TF} AS rel FROM post WHERE term = '{_BPREF_TERM}'
),
tot AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total,
         CAST(sum(CASE WHEN rel THEN 0 ELSE 1 END) AS BIGINT) AS n_total
  FROM judged
),
rkd AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_BPREF_TERM)})
),
run AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM rkd QUALIFY rank <= {_BPREF_K}
),
rj AS (SELECT r.rank, j.rel FROM run r JOIN judged j USING (doc_id)),
ab AS (
  SELECT rank, rel,
         CAST(coalesce(sum(CASE WHEN rel THEN 0 ELSE 1 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS nonrel_above
  FROM rj
),
contrib AS (
  SELECT t.r_total, t.n_total,
         CAST(floor(
           (1.0 - CAST(least(nonrel_above, t.r_total) AS DOUBLE)
                  / CAST(least(t.r_total, t.n_total) AS DOUBLE))
           * 1000000000.0 + 0.5) AS BIGINT) AS cq
  FROM ab, tot t WHERE rel
)
SELECT r_total, n_total,
       CAST(floor(CAST(sum(cq) AS DOUBLE) / CAST(r_total AS DOUBLE) + 0.5) AS BIGINT)
         AS bpref_q9
FROM contrib GROUP BY r_total, n_total
"""


@gate("bpref_eval", _BPREF_SQL)
def bpref_eval(spark, sf_dir):
    """bpref over the tf-convention judged pool for one term query."""
    from lucenenet_spark.search.quality import bpref_at_k

    _, s, _ = get_engine(spark, sf_dir)
    return bpref_at_k(s, _BPREF_TERM, k=_BPREF_K, min_tf=_BPREF_MIN_TF)
