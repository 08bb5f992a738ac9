"""Gate registry round-5 part zza: sample-based shard selection (ReDDE)
and the PForDelta block-size audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# redde_shards — Si & Callan SIGIR'03: rank the source shards by
# sample-top-50 membership scaled by 1/sample_rate; exact integers.
# ----------------------------------------------------------------------
_RD_TERM = "vector"
_RD_MOD = 5
_RD_TOP = 50

_RD_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc0 AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_RD_TERM)})
),
smp AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS r
    FROM sc0 WHERE doc_id % {_RD_MOD} = 0
  ) WHERE r <= {_RD_TOP}
),
hits AS (
  SELECT d.source AS shard, CAST(count(*) AS BIGINT) AS sample_hits
  FROM smp JOIN documents d USING (doc_id)
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY sample_hits * {_RD_MOD} DESC, shard ASC)
            AS BIGINT) AS rank,
       shard, sample_hits,
       CAST(sample_hits * {_RD_MOD} AS BIGINT) AS est_docs
FROM hits
"""


@gate("redde_shards", _RD_SQL)
def redde_shards(spark, sf_dir):
    """ReDDE estimate of relevant docs per source shard."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.sharded import redde_shard_selection

    _, s, _ = get_engine(spark, sf_dir)
    return redde_shard_selection(
        s, _docs_table(spark, sf_dir), _RD_TERM,
        shard_col="source", sample_mod=_RD_MOD, n_sample_top=_RD_TOP,
    )


# ----------------------------------------------------------------------
# pfordelta_audit — Zukowski ICDE'06 / Zhang WWW'08: 90th-percentile
# bit width + 32-bit exceptions per 128-gap block, integer order
# statistics only.
# ----------------------------------------------------------------------
_PF_TOP = 3
_PF_BLK = 128

_PF_SQL = SQL_PRELUDE + f""",
topt AS (
  SELECT term, CAST(df AS BIGINT) AS df FROM (
    SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS r
    FROM ts) WHERE r <= {_PF_TOP}
),
gaps AS (
  SELECT p.term, p.doc_id,
         p.doc_id - coalesce(lag(p.doc_id) OVER (
           PARTITION BY p.term ORDER BY p.doc_id ASC), -1) AS gap,
         row_number() OVER (PARTITION BY p.term ORDER BY p.doc_id ASC) AS rn
  FROM post p JOIN topt USING (term)
),
g2 AS (
  SELECT term, doc_id, gap, CAST((rn - 1) // {_PF_BLK} AS BIGINT) AS blk,
         CAST(length(bin(gap)) AS BIGINT) AS gbits
  FROM gaps
),
sized AS (
  SELECT term, blk, gap, gbits,
         row_number() OVER (PARTITION BY term, blk
                            ORDER BY gap ASC, doc_id ASC) AS grank
  FROM g2
),
nb AS (SELECT term, blk, CAST(count(*) AS BIGINT) AS n_b FROM g2 GROUP BY 1, 2),
bsel AS (
  SELECT s.term, s.blk, s.gbits AS b, n.n_b
  FROM sized s JOIN nb n USING (term, blk)
  WHERE s.grank = CAST(ceil(n.n_b * 9 / 10) AS BIGINT)
),
blocks AS (
  SELECT g.term, g.blk, b.b, b.n_b,
         CAST(sum(CASE WHEN g.gbits > b.b THEN 1 ELSE 0 END) AS BIGINT) AS exc
  FROM g2 g JOIN bsel b USING (term, blk)
  GROUP BY 1, 2, 3, 4
)
SELECT t.term, t.df,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(n_b * b + exc * 32) AS BIGINT) AS total_bits,
       CAST(sum(exc) AS BIGINT) AS exceptions
FROM blocks JOIN topt t USING (term)
GROUP BY t.term, t.df
"""


@gate("pfordelta_audit", _PF_SQL)
def pfordelta_audit(spark, sf_dir):
    """PForDelta block sizing for the 3 heaviest posting lists."""
    from lucenenet_spark.functions.docid_layout import pfordelta_size_audit

    idx, _, _ = get_engine(spark, sf_dir)
    return pfordelta_size_audit(idx, top_terms=_PF_TOP, block=_PF_BLK)
