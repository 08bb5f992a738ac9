"""Gate registry round-5 part zt: the federated broker path end-to-end
and Borda-count rank fusion.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# federated_topk — CORI ranks the 4 hash shards for the query, the top
# 2 are searched with GLOBAL stats, results merged; global_overlap
# audits recall-at-probe.  Oracle rebuilds the single-term CORI belief
# per shard, picks the same 2 shards, and replays the merge.
# ----------------------------------------------------------------------
_FED_TERM = "vector"
_FED_NS = 4
_FED_PROBE = 2
_FED_K = 10

_FED_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
cwp AS (
  SELECT doc_id % {_FED_NS} AS shard_id, CAST(sum(dl) AS BIGINT) AS cw
  FROM dl GROUP BY 1
),
dfs AS (
  SELECT doc_id % {_FED_NS} AS shard_id, CAST(count(*) AS BIGINT) AS df
  FROM post WHERE term = '{_FED_TERM}' GROUP BY 1
),
cft AS (SELECT CAST(count(*) AS BIGINT) AS cf FROM dfs),
acw AS (SELECT CAST(sum(cw) AS DOUBLE) / {float(_FED_NS)!r} AS acw FROM cwp),
bel AS (
  SELECT s.shard_id,
    CAST(floor((
      0.4 + 0.6 *
      (CAST(coalesce(d.df, 0) AS DOUBLE)
         / (CAST(coalesce(d.df, 0) AS DOUBLE) + 50.0
            + 150.0 * CAST(coalesce(w.cw, 0) AS DOUBLE) / a.acw)) *
      (ln(({float(_FED_NS)!r} + 0.5) / CAST(greatest(c.cf, 1) AS DOUBLE))
         / ln({float(_FED_NS) + 1.0!r}))
    ) * 1000000 + 0.5) AS BIGINT) AS belief_q6
  FROM (SELECT unnest(generate_series(0, {_FED_NS - 1})) AS shard_id) s
  LEFT JOIN dfs d USING (shard_id)
  LEFT JOIN cwp w USING (shard_id)
  CROSS JOIN cft c
  CROSS JOIN acw a
),
chosen AS (
  SELECT CAST(shard_id AS BIGINT) AS shard_id FROM (
    SELECT shard_id,
           row_number() OVER (ORDER BY belief_q6 DESC, shard_id ASC) AS r
    FROM bel) WHERE r <= {_FED_PROBE}
),
sc0 AS (
  SELECT doc_id, CAST(doc_id % {_FED_NS} AS BIGINT) AS shard_id,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_FED_TERM)})
),
page AS (
  SELECT rank, doc_id, shard_id, score_q FROM (
    SELECT s.*, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM sc0 s JOIN chosen USING (shard_id)
  ) WHERE rank <= {_FED_K}
),
gtop AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS g
    FROM sc0) WHERE g <= {_FED_K}
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS global_overlap
  FROM page JOIN gtop USING (doc_id)
)
SELECT CAST(p.rank AS BIGINT) AS rank, p.doc_id, p.shard_id, p.score_q,
       ov.global_overlap
FROM page p, ov
"""


@gate("federated_topk", _FED_SQL)
def federated_topk(spark, sf_dir):
    """CORI-routed 2-of-4-shard top-10 with recall-at-probe audit."""
    from lucenenet_spark.search.sharded import cori_routed_topk

    _, s, _ = get_engine(spark, sf_dir)
    return cori_routed_topk(
        s, _FED_TERM, n_shards=_FED_NS, n_probe=_FED_PROBE, k=_FED_K
    )


# ----------------------------------------------------------------------
# borda_fusion — Aslam & Montague SIGIR'01 positional voting over the
# BM25 and Classic top-10 for one query (the team-draft input pair).
# ----------------------------------------------------------------------
_BF_TERM = "vector"
_BF_K = 10

_BF_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank_0
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_BF_TERM)})
  ) QUALIFY rank_0 <= {_BF_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_BF_TERM}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank_1
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{_BF_TERM}'
  ) QUALIFY rank_1 <= {_BF_K}
),
fused AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id, ra.rank_0, rb.rank_1
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
),
pts AS (
  SELECT doc_id,
         CAST(coalesce({_BF_K + 1} - rank_0, 0)
              + coalesce({_BF_K + 1} - rank_1, 0) AS BIGINT) AS points,
         CAST(coalesce(rank_0, 0) AS BIGINT) AS rank_0,
         CAST(coalesce(rank_1, 0) AS BIGINT) AS rank_1
  FROM fused
)
SELECT CAST(row_number() OVER (ORDER BY points DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, points, rank_0, rank_1
FROM pts
QUALIFY rank <= {_BF_K}
"""


@gate("borda_fusion", _BF_SQL)
def borda_fusion(spark, sf_dir):
    """Borda fusion of the BM25 and Classic top-10 rankings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.hybrid import borda_fuse
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, s, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))

    def _rank(scored):
        return (
            scored.select(
                "doc_id",
                F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
                .cast("long")
                .alias("score_q"),
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _BF_K)
            .select("doc_id", "rank")
        )

    bm25 = _rank(s.scored(TermQuery(_BF_TERM)))
    classic_r = _rank(classic.scored(TermQuery(_BF_TERM)))
    return borda_fuse([bm25, classic_r], k=_BF_K, topk=_BF_K)
