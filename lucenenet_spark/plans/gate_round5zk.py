"""Gate registry round-5 part zk: federated-search broker metrics —
exact-integer MAP/MRR/P@k evaluation and CORI shard selection.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# map_mrr_eval — trec_eval's map / recip_rank / P.10 rows as EXACT
# integers: scale S = lcm(1..k) = 2520 makes every rank-precision an
# integer (see quality.map_mrr_at_k).
# ----------------------------------------------------------------------
_MM_TERM = "query"
_MM_K = 10
_MM_MIN_TF = 2
_MM_SCALE = 2520  # lcm(1..10)

_MM_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_MM_MIN_TF} AS rel FROM post WHERE term = '{_MM_TERM}'
),
tot AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM judged
),
rkd AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_MM_TERM)})
),
run AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM rkd QUALIFY rank <= {_MM_K}
),
rj AS (
  SELECT r.rank, coalesce(j.rel, false) AS rel
  FROM run r LEFT JOIN judged j USING (doc_id)
),
cum AS (
  SELECT rank, rel,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS relcnt
  FROM rj
)
SELECT t.r_total,
       CAST({_MM_SCALE} AS BIGINT) AS scale_s,
       CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS p_at_k,
       CAST(coalesce({_MM_SCALE} / min(CASE WHEN rel THEN rank END), 0) AS BIGINT)
         AS rr_num_s,
       CAST(coalesce(sum(CASE WHEN rel THEN relcnt * {_MM_SCALE} / rank END), 0) AS BIGINT)
         AS ap_num_s
FROM cum, tot t GROUP BY t.r_total
"""


@gate("map_mrr_eval", _MM_SQL)
def map_mrr_eval(spark, sf_dir):
    """MAP/MRR/P@10 over the tf>=2 judged pool, exact lcm-scaled ints."""
    from lucenenet_spark.search.quality import map_mrr_at_k

    _, s, _ = get_engine(spark, sf_dir)
    return map_mrr_at_k(s, _MM_TERM, k=_MM_K, min_tf=_MM_MIN_TF)


# ----------------------------------------------------------------------
# cori_shard_selection — Callan SIGIR'95 resource ranking over the
# doc_id % 4 hash shards; per-term beliefs quantized to q6 integers
# before the cross-term sum (no double summation-order dependence).
# ----------------------------------------------------------------------
_CO_TERMS = ("vector", "merge", "query")
_CO_NS = 4
_CO_B = 0.4
_CO_CDF = 50.0
_CO_CCW = 150.0

_CO_TERMS_SQL = ", ".join(f"('{t}')" for t in _CO_TERMS)

_CORI_SQL = SQL_PRELUDE + f""",
cwp AS (
  SELECT doc_id % {_CO_NS} AS shard_id, CAST(sum(dl) AS BIGINT) AS cw
  FROM dl GROUP BY 1
),
dfs AS (
  SELECT term, doc_id % {_CO_NS} AS shard_id, CAST(count(*) AS BIGINT) AS df
  FROM post WHERE term IN ({", ".join(f"'{t}'" for t in _CO_TERMS)})
  GROUP BY 1, 2
),
cft AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM dfs GROUP BY 1),
acw AS (SELECT CAST(sum(cw) AS DOUBLE) / {float(_CO_NS)!r} AS acw FROM cwp),
grid AS (
  SELECT t.term, s.shard_id
  FROM (VALUES {_CO_TERMS_SQL}) t(term)
  CROSS JOIN (SELECT unnest(generate_series(0, {_CO_NS - 1})) AS shard_id) s
),
bel AS (
  SELECT g.shard_id,
    CAST(floor((
      {_CO_B!r} + {1.0 - _CO_B!r} *
      (CAST(coalesce(d.df, 0) AS DOUBLE)
         / (CAST(coalesce(d.df, 0) AS DOUBLE) + {_CO_CDF!r}
            + {_CO_CCW!r} * CAST(coalesce(w.cw, 0) AS DOUBLE) / a.acw)) *
      (ln(({float(_CO_NS)!r} + 0.5) / CAST(greatest(coalesce(c.cf, 0), 1) AS DOUBLE))
         / ln({float(_CO_NS) + 1.0!r}))
    ) * 1000000 + 0.5) AS BIGINT) AS belief_q6
  FROM grid g
  LEFT JOIN dfs d USING (term, shard_id)
  LEFT JOIN cft c USING (term)
  LEFT JOIN cwp w USING (shard_id)
  CROSS JOIN acw a
)
SELECT CAST(row_number() OVER (ORDER BY belief_sum_q6 DESC, shard_id ASC) AS BIGINT)
         AS rank,
       shard_id, belief_sum_q6
FROM (
  SELECT CAST(shard_id AS BIGINT) AS shard_id,
         CAST(sum(belief_q6) AS BIGINT) AS belief_sum_q6
  FROM bel GROUP BY 1
)
"""


@gate("cori_shard_selection", _CORI_SQL)
def cori_shard_selection(spark, sf_dir):
    """CORI belief ranking of the 4 hash shards for a 3-term query."""
    from lucenenet_spark.search.sharded import cori_shard_ranking

    idx, _, _ = get_engine(spark, sf_dir)
    return cori_shard_ranking(
        idx, _CO_TERMS, n_shards=_CO_NS,
        b_belief=_CO_B, c_df=_CO_CDF, c_cw=_CO_CCW,
    )
