"""Gate registry round-5 part zzj: multi-query GMAP (TREC Robust track
summary metric) and Sakai's Q-measure blended-ratio curve.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_GM_TERMS = ("query", "scan", "vector")  # kept in sorted order
_GM_K = 10
_GM_MIN_TF = 2
_GM_SCALE = 2520  # lcm(1..10)


def _ap_ctes(i: int, term: str) -> str:
    """Per-query exact-integer AP chain (mirrors map_mrr_eval's oracle)."""
    return f"""
j{i} AS (
  SELECT doc_id, tf >= {_GM_MIN_TF} AS rel FROM post WHERE term = '{term}'
),
t{i} AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM j{i}
),
r{i} AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
        FROM ({_tsc(term)}))
  QUALIFY rank <= {_GM_K}
),
c{i} AS (
  SELECT rank, rel,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS relcnt
  FROM (SELECT r.rank, coalesce(j.rel, false) AS rel
        FROM r{i} r LEFT JOIN j{i} j USING (doc_id))
),
a{i} AS (
  SELECT CAST(coalesce(sum(CASE WHEN rel THEN relcnt * {_GM_SCALE} / rank END), 0)
              AS BIGINT) AS ap_num_s
  FROM c{i}
)"""


_GM_APS = [
    f"(CAST(a{i}.ap_num_s AS DOUBLE) / ({float(_GM_SCALE)!r} * CAST(t{i}.r_total AS DOUBLE)))"
    for i in (1, 2, 3)
]

_GM_SQL = (
    SQL_PRELUDE
    + ","
    + _SQL_SCORED
    + ","
    + ",".join(_ap_ctes(i, t) for i, t in enumerate(_GM_TERMS, start=1))
    + f"""
SELECT a1.ap_num_s AS ap1_num_s, t1.r_total AS r1_total,
       a2.ap_num_s AS ap2_num_s, t2.r_total AS r2_total,
       a3.ap_num_s AS ap3_num_s, t3.r_total AS r3_total,
       CAST({_GM_SCALE} AS BIGINT) AS scale_s,
       CAST(3 AS BIGINT) AS n_queries,
       CAST(floor((({_GM_APS[0]} + {_GM_APS[1]}) + {_GM_APS[2]}) / 3.0
            * 1000000000.0 + 0.5) AS BIGINT) AS map_q9,
       CASE WHEN a1.ap_num_s = 0 OR a2.ap_num_s = 0 OR a3.ap_num_s = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(exp(((ln({_GM_APS[0]}) + ln({_GM_APS[1]}))
                 + ln({_GM_APS[2]})) / 3.0) * 1000000000.0 + 0.5) AS BIGINT)
       END AS gmap_q9
FROM a1, t1, a2, t2, a3, t3
"""
)


@gate("gmap_eval", _GM_SQL)
def gmap_eval(spark, sf_dir):
    """GMAP + MAP over 3 queries, per-query APs as exact lcm-scaled
    integers, summary folds in explicit sorted-term order."""
    from lucenenet_spark.search.quality import gmap_eval as _gm

    _, s, _ = get_engine(spark, sf_dir)
    return _gm(s, list(_GM_TERMS), k=_GM_K, min_tf=_GM_MIN_TF)


# ----------------------------------------------------------------------
# q_measure_eval — per-relevant-hit blended-ratio curve BR(r) =
# 2*relcnt / (min(r, R) + r), q9-quantized, binary tf-convention gains.
# ----------------------------------------------------------------------
_QM_TERM = "query"
_QM_K = 20
_QM_MIN_TF = 2

_QM_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_QM_MIN_TF} AS rel FROM post WHERE term = '{_QM_TERM}'
),
tot AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM judged
),
run AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
        FROM ({_tsc(_QM_TERM)}))
  QUALIFY rank <= {_QM_K}
),
cum AS (
  SELECT rank, rel,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
           ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS relcnt
  FROM (SELECT r.rank, coalesce(j.rel, false) AS rel
        FROM run r LEFT JOIN judged j USING (doc_id))
)
SELECT rank, relcnt,
       CAST(floor(CAST(relcnt * 2 AS DOUBLE)
            / CAST(least(rank, t.r_total) + rank AS DOUBLE)
            * 1000000000.0 + 0.5) AS BIGINT) AS br_q9,
       t.r_total
FROM cum, tot t WHERE rel
"""


@gate("q_measure_eval", _QM_SQL)
def q_measure_eval(spark, sf_dir):
    """Q-measure blended-ratio rows for the top-20 run."""
    from lucenenet_spark.search.quality import q_measure

    _, s, _ = get_engine(spark, sf_dir)
    return q_measure(s, _QM_TERM, k=_QM_K, min_tf=_QM_MIN_TF)
