"""Gate registry round-5 part zzo: distributed top-k terms with
Fagin/TPUT error bounds, and Dunning G2 significant co-occurring
terms.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

_DT_SHARDS = 4
_DT_SHARD_K = 20
_DT_K = 10

_DT_SQL = SQL_PRELUDE + f""",
local AS (
  SELECT CAST(doc_id % {_DT_SHARDS} AS BIGINT) AS shard, term,
         CAST(count(*) AS BIGINT) AS cnt
  FROM post GROUP BY 1, 2
),
ranked AS (
  SELECT shard, term, cnt,
         row_number() OVER (PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn
  FROM local
),
reported AS (SELECT shard, term, cnt FROM ranked WHERE rn <= {_DT_SHARD_K}),
thr AS (SELECT shard, cnt AS thr FROM ranked WHERE rn = {_DT_SHARD_K}),
tot AS (SELECT CAST(coalesce(sum(thr), 0) AS BIGINT) AS sum_thr FROM thr),
est AS (
  SELECT term, CAST(sum(cnt) AS BIGINT) AS est_count FROM reported GROUP BY term
),
seen AS (
  SELECT r.term, CAST(coalesce(sum(t.thr), 0) AS BIGINT) AS seen_thr
  FROM reported r LEFT JOIN thr t USING (shard) GROUP BY r.term
),
truth AS (
  SELECT term, CAST(sum(cnt) AS BIGINT) AS true_count FROM local GROUP BY term
)
SELECT e.term, e.est_count, tr.true_count,
       CAST(tot.sum_thr - s.seen_thr AS BIGINT) AS err_bound,
       e.est_count = tr.true_count AS is_exact
FROM est e JOIN seen s USING (term) JOIN truth tr USING (term), tot
ORDER BY est_count DESC, term ASC LIMIT {_DT_K}
"""


@gate("distributed_topk_terms", _DT_SQL)
def distributed_topk_terms(spark, sf_dir):
    """Shard-local top-20 merge with exact TA/TPUT error bounds."""
    from lucenenet_spark.search.sharded import distributed_topk_terms as _dt

    idx, _, _ = get_engine(spark, sf_dir)
    return _dt(idx, n_shards=_DT_SHARDS, shard_k=_DT_SHARD_K, k=_DT_K)


# ----------------------------------------------------------------------
# significant_terms_g2 — Dunning log-likelihood lift of terms inside
# docset(vector) vs the corpus.
# ----------------------------------------------------------------------
_SG_SEED = "vector"
_SG_K = 15
_SG_MIN = 2


def _cell(k: str, row: str, col: str) -> str:
    return (
        f"CASE WHEN {k} > 0 THEN CAST({k} AS DOUBLE) "
        f"* ln((CAST({k} AS DOUBLE) * cs.n) / ({row} * {col})) ELSE 0.0 END"
    )


_SG_SQL = SQL_PRELUDE + f""",
fg AS (SELECT doc_id FROM post WHERE term = '{_SG_SEED}'),
nfg AS (SELECT CAST(count(*) AS BIGINT) AS n_fg FROM fg),
kk AS (
  SELECT p.term, CAST(count(*) AS BIGINT) AS k11
  FROM post p JOIN fg USING (doc_id)
  WHERE p.term <> '{_SG_SEED}'
  GROUP BY p.term HAVING count(*) >= {_SG_MIN}
),
t AS (
  SELECT k.term, k.k11,
         CAST(ts.df - k.k11 AS BIGINT) AS k21,
         CAST(f.n_fg - k.k11 AS BIGINT) AS k12,
         CAST(cs.n - ts.df - f.n_fg + k.k11 AS BIGINT) AS k22,
         CAST(ts.df AS BIGINT) AS df,
         CAST(f.n_fg AS DOUBLE) AS fgr,
         CAST(cs.n - f.n_fg AS DOUBLE) AS bgr,
         CAST(ts.df AS DOUBLE) AS wc,
         CAST(cs.n - ts.df AS DOUBLE) AS woc
  FROM kk k JOIN ts USING (term), nfg f, cs
)
SELECT term, k11, df,
       CAST(floor(2.0 * ((({_cell('k11', 'fgr', 'wc')}
             + {_cell('k12', 'fgr', 'woc')})
             + {_cell('k21', 'bgr', 'wc')})
             + {_cell('k22', 'bgr', 'woc')})
            * 1000000.0 + 0.5) AS BIGINT) AS g2_q6
FROM t, cs
ORDER BY g2_q6 DESC, term ASC LIMIT {_SG_K}
"""


@gate("significant_terms_g2", _SG_SQL)
def significant_terms_g2(spark, sf_dir):
    """Top-15 co-occurring terms of 'vector' by Dunning G2."""
    from lucenenet_spark.functions.textstats import significant_terms_g2 as _sg

    idx, _, _ = get_engine(spark, sf_dir)
    return _sg(idx, _SG_SEED, k=_SG_K, min_fg_df=_SG_MIN)
