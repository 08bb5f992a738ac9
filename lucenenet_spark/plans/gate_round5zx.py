"""Gate registry round-5 part zx: RBP evaluation and the stored-impact
quantization audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# rbp_eval — Moffat & Zobel TOIS'08 rank-biased precision at p = 4/5,
# exact via per-rank integer weights 4^(i-1)·5^(k-i).
# ----------------------------------------------------------------------
_RBP_TERM = "query"
_RBP_K = 10
_RBP_MIN_TF = 2
_RBP_PN, _RBP_PD = 4, 5

_RBP_W = ", ".join(
    f"({i}, {_RBP_PN ** (i - 1) * _RBP_PD ** (_RBP_K - i)})"
    for i in range(1, _RBP_K + 1)
)

_RBP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_RBP_MIN_TF} AS rel FROM post WHERE term = '{_RBP_TERM}'
),
run AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
          FROM ({_tsc(_RBP_TERM)}))
  ) WHERE rank <= {_RBP_K}
),
wts(rank, wgt) AS (SELECT * FROM (VALUES {_RBP_W})),
rj AS (
  SELECT r.rank, coalesce(j.rel, false) AS rel, w.wgt
  FROM run r LEFT JOIN judged j USING (doc_id) JOIN wts w USING (rank)
)
SELECT CAST(count(*) AS BIGINT) AS k_eff,
       CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS rel_in_run,
       CAST(coalesce(sum(CASE WHEN rel THEN wgt END), 0) AS BIGINT) AS rbp_num_s,
       CAST({_RBP_PD ** (_RBP_K - 1)} AS BIGINT) AS denom_s
FROM rj
"""


@gate("rbp_eval", _RBP_SQL)
def rbp_eval(spark, sf_dir):
    """Exact rank-biased precision components at p = 0.8."""
    from lucenenet_spark.search.quality import rbp_at_k

    _, s, _ = get_engine(spark, sf_dir)
    return rbp_at_k(s, _RBP_TERM, k=_RBP_K, min_tf=_RBP_MIN_TF,
                    p_num=_RBP_PN, p_den=_RBP_PD)


# ----------------------------------------------------------------------
# impact_quantization — Anh & Moffat SIGIR'05/'06 stored-impact levels
# (3 bits): Kendall tau-a of the level-ordering vs the exact ordering.
# ----------------------------------------------------------------------
_IQ_TERM = "vector"
_IQ_L = 8

_IQ_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
imp AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS imp
  FROM ({_tsc(_IQ_TERM)})
),
rng AS (SELECT min(imp) AS lo, max(imp) AS hi FROM imp),
lv AS (
  SELECT doc_id, imp,
         CAST(floor((imp - r.lo) * {_IQ_L} / (r.hi - r.lo + 1)) AS BIGINT) AS lvl
  FROM imp, rng r
),
prs AS (
  SELECT a.doc_id AS da, a.imp AS ia, a.lvl AS la,
         b.doc_id AS db, b.imp AS ib, b.lvl AS lb
  FROM lv a JOIN lv b ON a.doc_id < b.doc_id
),
cd AS (
  SELECT
    CAST(sum(CASE WHEN ((ia > ib) OR (ia = ib AND da < db))
                     = ((la > lb) OR (la = lb AND da < db))
             THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
    CAST(sum(CASE WHEN ((ia > ib) OR (ia = ib AND da < db))
                    <> ((la > lb) OR (la = lb AND da < db))
             THEN 1 ELSE 0 END) AS BIGINT) AS discordant
  FROM prs
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT lvl) AS BIGINT) AS distinct_levels
  FROM lv
)
SELECT nn.n, CAST({_IQ_L} AS BIGINT) AS levels, nn.distinct_levels,
       cd.concordant, cd.discordant,
       CAST(floor(CAST(cd.concordant - cd.discordant AS DOUBLE)
                  / (CAST(nn.n * (nn.n - 1) AS DOUBLE) / 2.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS tau_q6
FROM nn, cd
"""


@gate("impact_quantization", _IQ_SQL)
def impact_quantization(spark, sf_dir):
    """3-bit impact-level fidelity audit for one term's postings."""
    from lucenenet_spark.functions.docid_layout import impact_quantization_audit

    idx, _, _ = get_engine(spark, sf_dir)
    return impact_quantization_audit(idx, _IQ_TERM, levels=_IQ_L)
