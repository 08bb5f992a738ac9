"""Gate registry round-5 part zzzc: paired randomization significance
testing (Smucker CIKM'07) and counterfactual IPS ranker evaluation
(Joachims WSDM'17) — both over the BM25-vs-Classic system pair the
kendall/rbo gates already compare.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_K = 10
_MIN_TF = 2
_SCALE = 2520  # lcm(1..10)
_RT_TERMS = ("filter", "merge", "query", "scan", "vector")
_RT_TRIALS = 64
_IPS_TERMS = ("query", "scan", "vector")


def _sys_ctes(i: int, term: str) -> str:
    """Per-term CTE chain: judged set, BM25 ranking + AP, Classic
    ranking + AP (classic scoring replicates the kendall_tau_rankings
    oracle: sqrt(tf) * idf^2 * queryNorm * 1/sqrt(dl))."""
    return f"""
j{i} AS (
  SELECT doc_id, tf >= {_MIN_TF} AS rel FROM post WHERE term = '{term}'
),
t{i} AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM j{i}
),
rA{i} AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
        FROM ({_tsc(term)}))
  QUALIFY rank <= {_K}
),
tv{i} AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value
  FROM (SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{term}')
),
rB{i} AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv{i}.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv{i}
    WHERE p.term = '{term}'
  ) QUALIFY rank <= {_K}
),
cA{i} AS (
  SELECT rank, rel,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS relcnt
  FROM (SELECT r.rank, coalesce(j.rel, false) AS rel
        FROM rA{i} r LEFT JOIN j{i} j USING (doc_id))
),
aA{i} AS (
  SELECT CAST(coalesce(sum(CASE WHEN rel THEN relcnt * {_SCALE} / rank END), 0)
              AS BIGINT) AS ap_num_s
  FROM cA{i}
),
cB{i} AS (
  SELECT rank, rel,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS relcnt
  FROM (SELECT r.rank, coalesce(j.rel, false) AS rel
        FROM rB{i} r LEFT JOIN j{i} j USING (doc_id))
),
aB{i} AS (
  SELECT CAST(coalesce(sum(CASE WHEN rel THEN relcnt * {_SCALE} / rank END), 0)
              AS BIGINT) AS ap_num_s
  FROM cB{i}
)"""


def _apq9(a: str, t: str) -> str:
    return (
        f"CASE WHEN {t}.r_total > 0 THEN "
        f"(2 * {a}.ap_num_s * 1000000000 + {_SCALE} * {t}.r_total)"
        f" // (2 * {_SCALE} * {t}.r_total) ELSE 0 END"
    )


# ----------------------------------------------------------------------
# randomization_test — two-sided paired sign-flip test, 64 md5-
# deterministic trials over the per-query q9 AP differences.
# ----------------------------------------------------------------------
_RT_SQL = (
    SQL_PRELUDE
    + ","
    + _SQL_SCORED
    + ","
    + ",".join(_sys_ctes(i, t) for i, t in enumerate(_RT_TERMS, start=1))
    + f""",
dall AS (
  {" UNION ALL ".join(
      f"SELECT '{t}' AS term, CAST(({_apq9(f'aA{i}', f't{i}')}) - ({_apq9(f'aB{i}', f't{i}')}) AS BIGINT) AS d FROM aA{i}, aB{i}, t{i}"
      for i, t in enumerate(_RT_TERMS, start=1)
  )}
),
trials AS (SELECT unnest(generate_series(0, {_RT_TRIALS - 1})) AS trial),
signed AS (
  SELECT trial,
    CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(trial AS VARCHAR) || ':' || term), 1, 1)) - 1) < 8
         THEN d ELSE -d END AS sd
  FROM trials, dall
),
pt AS (SELECT trial, CAST(sum(sd) AS BIGINT) AS s FROM signed GROUP BY trial),
ob AS (SELECT CAST(sum(d) AS BIGINT) AS d_obs FROM dall)
SELECT CAST({len(_RT_TERMS)} AS BIGINT) AS n_queries,
       CAST({_RT_TRIALS} AS BIGINT) AS n_trials,
       ob.d_obs AS d_obs_q9,
       CAST(sum(CASE WHEN abs(pt.s) >= abs(ob.d_obs) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_extreme,
       CAST(sum(CASE WHEN abs(pt.s) >= abs(ob.d_obs) THEN 1 ELSE 0 END)
            * 1000000 // {_RT_TRIALS} AS BIGINT) AS p_ppm
FROM pt, ob GROUP BY ob.d_obs
"""
)


@gate("randomization_test", _RT_SQL)
def randomization_test_gate(spark, sf_dir):
    """Paired randomization test, BM25 vs Classic AP@10 over 5 queries."""
    from lucenenet_spark.search.quality import randomization_test
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")
    return randomization_test(
        searcher, classic, list(_RT_TERMS), k=_K, min_tf=_MIN_TF, n_trials=_RT_TRIALS
    )


# ----------------------------------------------------------------------
# ips_ranker_eval — clicks logged under BM25 with a deterministic
# position-biased examination model (ranks 1-3 examined, deeper ranks
# iff doc_id even, propensity weight 1 or 2); IPS estimate of the
# Classic ranker's discounted utility, lcm-scaled exact integers.
# ----------------------------------------------------------------------
_IPS_SQL = (
    SQL_PRELUDE
    + ","
    + _SQL_SCORED
    + ","
    + ",".join(_sys_ctes(i, t) for i, t in enumerate(_IPS_TERMS, start=1))
    + ","
    + ",".join(
        f"""
ipc{i} AS (
  SELECT r.doc_id, r.rank AS rank_log, w.rank AS rank_tgt
  FROM rA{i} r
  JOIN j{i} j ON j.doc_id = r.doc_id AND j.rel
  LEFT JOIN rB{i} w ON w.doc_id = r.doc_id
  WHERE r.rank <= 3 OR r.doc_id % 2 = 0
),
ips{i} AS (
  SELECT CAST(count(*) AS BIGINT) AS n_clicks,
         CAST(coalesce(sum(CASE WHEN rank_log <= 3 THEN 1 ELSE 2 END), 0) AS BIGINT)
           AS sum_w,
         CAST(coalesce(sum((CASE WHEN rank_log <= 3 THEN 1 ELSE 2 END)
              * (CASE WHEN rank_tgt IS NOT NULL THEN {_SCALE} // rank_tgt ELSE 0 END)),
              0) AS BIGINT) AS ips_num_s
  FROM ipc{i}
)"""
        for i in range(1, len(_IPS_TERMS) + 1)
    )
    + f"""
{" UNION ALL ".join(
    f"SELECT '{t}' AS term, n_clicks, sum_w, ips_num_s, CAST({_SCALE} AS BIGINT) AS scale_s FROM ips{i}"
    for i, t in enumerate(_IPS_TERMS, start=1)
)}
ORDER BY term
"""
)


@gate("ips_ranker_eval", _IPS_SQL)
def ips_ranker_eval(spark, sf_dir):
    """IPS counterfactual estimate of Classic from BM25-logged clicks."""
    from lucenenet_spark.search.quality import ips_eval
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")
    return ips_eval(
        searcher, classic, list(_IPS_TERMS), k=_K, min_tf=_MIN_TF
    ).orderBy("term")
