"""Gate registry round-5 part zze: TREC curve diagnostics — 11-point
interpolated precision and R-precision.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_IP_TERM = "query"
_IP_K = 450
_IP_MIN_TF = 2

# ----------------------------------------------------------------------
# interp_precision_11pt — TREC 11-point curve: per-rank P quantized q9
# BEFORE the max (one IEEE division each), cross-multiplied recall
# qualifier; k=450 covers R so the curve reaches recall 1.0.
# ----------------------------------------------------------------------
_IP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_IP_MIN_TF} AS rel FROM post WHERE term = '{_IP_TERM}'
),
tot AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM judged
),
run AS (
  SELECT rank, relcnt,
         CAST(floor(CAST(relcnt AS DOUBLE) / CAST(rank AS DOUBLE)
                    * 1000000000.0 + 0.5) AS BIGINT) AS p_q9
  FROM (
    SELECT rank,
           CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) OVER (
             ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS relcnt
    FROM (
      SELECT r.rank, coalesce(j.rel, false) AS rel
      FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
        FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
              FROM ({_tsc(_IP_TERM)}))
        QUALIFY rank <= {_IP_K}
      ) r LEFT JOIN judged j USING (doc_id)
    )
  )
),
lv AS (SELECT CAST(unnest(generate_series(0, 10)) AS BIGINT) AS level10),
pts AS (
  SELECT l.level10, CAST(max(r.p_q9) AS BIGINT) AS p_interp_q9
  FROM lv l, run r, tot t
  WHERE r.relcnt * 10 >= l.level10 * t.r_total
  GROUP BY 1
)
SELECT l.level10,
       CAST(coalesce(p.p_interp_q9, 0) AS BIGINT) AS p_interp_q9,
       t.r_total
FROM lv l LEFT JOIN pts p USING (level10) CROSS JOIN tot t
"""


@gate("interp_precision_11pt", _IP_SQL)
def interp_precision_11pt(spark, sf_dir):
    """The 11-point interpolated PR curve over the top-20 run."""
    from lucenenet_spark.search.quality import interp_precision_11pt as _ip

    _, s, _ = get_engine(spark, sf_dir)
    return _ip(s, _IP_TERM, k=_IP_K, min_tf=_IP_MIN_TF)


# ----------------------------------------------------------------------
# r_precision — precision at rank R (break-even point), exact pair of
# integers.
# ----------------------------------------------------------------------
_RP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
judged AS (
  SELECT doc_id, tf >= {_IP_MIN_TF} AS rel FROM post WHERE term = '{_IP_TERM}'
),
tot AS (
  SELECT CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS r_total FROM judged
),
rkd AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
        FROM ({_tsc(_IP_TERM)}))
)
SELECT t.r_total,
       CAST(sum(CASE WHEN coalesce(j.rel, false) THEN 1 ELSE 0 END) AS BIGINT)
         AS rel_at_r
FROM rkd r
LEFT JOIN judged j USING (doc_id)
CROSS JOIN tot t
WHERE r.rank <= t.r_total
GROUP BY t.r_total
"""


@gate("r_precision", _RP_SQL)
def r_precision(spark, sf_dir):
    """Precision at rank R for the tf>=2 judged pool."""
    from lucenenet_spark.search.quality import r_precision as _rp

    _, s, _ = get_engine(spark, sf_dir)
    return _rp(s, _IP_TERM, min_tf=_IP_MIN_TF)
