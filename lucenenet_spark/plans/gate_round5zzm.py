"""Gate registry round-5 part zzm: token-diversity quality signals —
per-doc unigram entropy and Church–Gale term burstiness.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# unigram_entropy_topk — 20 most token-diverse docs; contributions
# quantized to q9 integers before the per-doc sum.
# ----------------------------------------------------------------------
_UE_SQL = SQL_PRELUDE + """,
dld AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM post GROUP BY doc_id
),
con AS (
  SELECT p.doc_id,
         CAST(floor(-(CAST(p.tf AS DOUBLE) / d.dl)
              * ln(CAST(p.tf AS DOUBLE) / d.dl)
              * 1000000000.0 + 0.5) AS BIGINT) AS c_q9
  FROM post p JOIN dld d USING (doc_id)
)
SELECT d.doc_id, d.dl, d.n_distinct,
       CAST(sum(c.c_q9) AS BIGINT) AS entropy_q9_sum
FROM dld d JOIN con c USING (doc_id)
GROUP BY d.doc_id, d.dl, d.n_distinct
ORDER BY entropy_q9_sum DESC, d.doc_id ASC LIMIT 20
"""


@gate("unigram_entropy_topk", _UE_SQL)
def unigram_entropy_topk(spark, sf_dir):
    """Top-20 docs by unigram entropy (token diversity)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.textstats import unigram_entropy

    idx, _, _ = get_engine(spark, sf_dir)
    return (
        unigram_entropy(idx)
        .orderBy(F.desc("entropy_q9_sum"), F.asc("doc_id"))
        .limit(20)
    )


# ----------------------------------------------------------------------
# term_burstiness_topk — 20 burstiest terms with df >= 5.
# ----------------------------------------------------------------------
_TB_MIN_DF = 5

_TB_SQL = SQL_PRELUDE + f"""
SELECT term, CAST(df AS BIGINT) AS df, CAST(ttf AS BIGINT) AS ttf,
       CAST(floor(CAST(ttf AS DOUBLE) / CAST(df AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS burst_q6
FROM ts WHERE df >= {_TB_MIN_DF}
ORDER BY burst_q6 DESC, term ASC LIMIT 20
"""


@gate("term_burstiness_topk", _TB_SQL)
def term_burstiness_topk(spark, sf_dir):
    """Top-20 burstiest terms (Church–Gale B = ttf/df)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.textstats import term_burstiness

    idx, _, _ = get_engine(spark, sf_dir)
    return (
        term_burstiness(idx, min_df=_TB_MIN_DF)
        .orderBy(F.desc("burst_q6"), F.asc("term"))
        .limit(20)
    )
