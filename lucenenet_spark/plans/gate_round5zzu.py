"""Gate registry round-5 part zzu: vocabulary planning — coverage
curve per candidate vocab size and df-ratio stopword induction.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

_VC_SIZES = (100, 500, 1000, 2000)

_VC_SQL = SQL_PRELUDE + f""",
ranked AS (
  SELECT term, ttf,
         row_number() OVER (ORDER BY ttf DESC, term ASC) AS rnk,
         sum(ttf) OVER (ORDER BY ttf DESC, term ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM ts
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_terms_total,
         CAST(sum(ttf) AS BIGINT) AS total_tokens
  FROM ts
),
vs AS (SELECT CAST(unnest([{", ".join(str(v) for v in _VC_SIZES)}]) AS BIGINT)
         AS vocab_size)
SELECT v.vocab_size, t.n_terms_total,
       CAST(r.cum AS BIGINT) AS covered_tokens, t.total_tokens
FROM vs v, tot t
JOIN ranked r ON r.rnk = least(v.vocab_size, t.n_terms_total)
"""


@gate("vocab_coverage_curve", _VC_SQL)
def vocab_coverage_curve(spark, sf_dir):
    """Token mass covered by the top-V terms, V in {100,500,1k,2k}."""
    from lucenenet_spark.functions.textstats import vocab_coverage_curve as _vc

    idx, _, _ = get_engine(spark, sf_dir)
    return _vc(idx, vocab_sizes=_VC_SIZES)


# ----------------------------------------------------------------------
# stopword_induction — df/N > 0.5 stoplist candidates, integer
# cross-multiplied predicate.
# ----------------------------------------------------------------------
_SW_SQL = SQL_PRELUDE + """
SELECT term, CAST(df AS BIGINT) AS df, CAST(ttf AS BIGINT) AS ttf,
       CAST(floor(CAST(df AS DOUBLE) / cs.n * 10000.0 + 0.5) AS BIGINT)
         AS pct_docs_q4
FROM ts, cs
WHERE df * 1000000 > 500000 * CAST(cs.n AS BIGINT)
ORDER BY df DESC, term ASC
"""


@gate("stopword_induction", _SW_SQL)
def stopword_induction(spark, sf_dir):
    """Automatic stoplist candidates above the 50%-of-docs df ratio."""
    from lucenenet_spark.functions.textstats import stopword_induction as _sw

    idx, _, _ = get_engine(spark, sf_dir)
    return _sw(idx, df_ratio_threshold=0.5)
