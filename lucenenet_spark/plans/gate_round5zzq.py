"""Gate registry round-5 part zzq: autocomplete evaluation — MPC
prefix-replay ranks (Bar-Yossef & Kraus WWW'11) and the derived
accept-at-top-k keystroke savings.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

_AC_TARGETS = 20
_AC_MAXPX = 4
_AC_TOPK = 4  # suggestion box size for keystroke savings

_AC_CTES = f"""
tg AS (
  SELECT term AS t, CAST(df AS BIGINT) AS t_df
  FROM ts ORDER BY df DESC, term ASC LIMIT {_AC_TARGETS}
),
lens AS (SELECT CAST(unnest(generate_series(1, {_AC_MAXPX})) AS INT) AS prefix_len),
tl AS (
  SELECT t, t_df, prefix_len, substr(t, 1, prefix_len) AS px
  FROM tg, lens WHERE length(t) >= prefix_len
),
rk AS (
  SELECT tl.t AS term, tl.t_df AS df,
         CAST(tl.prefix_len AS BIGINT) AS prefix_len,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN ts.df > tl.t_df
                        OR (ts.df = tl.t_df AND ts.term < tl.t)
                  THEN 1 ELSE 0 END) + 1 AS BIGINT) AS rank
  FROM tl JOIN ts ON substr(ts.term, 1, tl.prefix_len) = tl.px
  GROUP BY 1, 2, 3
)"""

_AR_SQL = SQL_PRELUDE + "," + _AC_CTES + """
SELECT term, df, prefix_len, n_candidates, rank FROM rk
"""


@gate("autocomplete_mrr", _AR_SQL)
def autocomplete_mrr(spark, sf_dir):
    """MPC replay ranks for the 20 head terms at prefix lengths 1-4."""
    from lucenenet_spark.search.suggest import mpc_prefix_ranks

    idx, _, _ = get_engine(spark, sf_dir)
    return mpc_prefix_ranks(idx, n_targets=_AC_TARGETS, max_prefix=_AC_MAXPX)


# ----------------------------------------------------------------------
# keystroke_savings — first prefix length where the target enters the
# top-4 box; saved keys = len(term) - that length (0 saved if never).
# ----------------------------------------------------------------------
_KS_SQL = SQL_PRELUDE + "," + _AC_CTES + f"""
SELECT term, CAST(length(term) AS BIGINT) AS term_len,
       CAST(coalesce(min(CASE WHEN rank <= {_AC_TOPK} THEN prefix_len END),
            length(term)) AS BIGINT) AS min_prefix,
       CAST(length(term) - coalesce(min(CASE WHEN rank <= {_AC_TOPK}
            THEN prefix_len END), length(term)) AS BIGINT) AS saved
FROM rk GROUP BY term
"""


@gate("keystroke_savings", _KS_SQL)
def keystroke_savings(spark, sf_dir):
    """Keystrokes saved per head term with a 4-slot suggestion box."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.suggest import mpc_prefix_ranks

    idx, _, _ = get_engine(spark, sf_dir)
    rk = mpc_prefix_ranks(idx, n_targets=_AC_TARGETS, max_prefix=_AC_MAXPX)
    return rk.groupBy("term").agg(
        F.length("term").cast("long").alias("term_len"),
        F.coalesce(
            F.min(F.when(F.col("rank") <= _AC_TOPK, F.col("prefix_len"))),
            F.length("term").cast("long"),
        ).cast("long").alias("min_prefix"),
        (
            F.length("term").cast("long")
            - F.coalesce(
                F.min(F.when(F.col("rank") <= _AC_TOPK, F.col("prefix_len"))),
                F.length("term").cast("long"),
            )
        ).cast("long").alias("saved"),
    )
