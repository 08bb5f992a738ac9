"""Gate registry round-5 part zzzn: nonparametric vocabulary-richness
estimators (Chao1 / jackknife-1 / Simpson) over the bigram event table.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_VR_SQL = """
WITH tl AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
freqs AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT t[u.i] || ' ' || t[u.i + 1] AS w
    FROM tl, unnest(generate_series(1, length(t) - 1)) AS u(i)
    WHERE length(t) >= 2) GROUP BY w
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS v_obs,
         CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0) AS BIGINT) AS f1,
         CAST(coalesce(sum(CASE WHEN n = 2 THEN 1 END), 0) AS BIGINT) AS f2,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(sum(n * (n - 1)) AS BIGINT) AS rep2
  FROM freqs
)
SELECT v_obs, f1, f2, n_tokens,
  CAST(floor(
    (CASE WHEN f2 > 0 THEN
       CAST(v_obs AS DOUBLE)
       + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE))
     ELSE
       CAST(v_obs AS DOUBLE)
       + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / 2.0
     END) * 100.0 + 0.5) AS BIGINT) AS chao1_q2,
  CAST(v_obs + f1 AS BIGINT) AS jack1,
  CASE WHEN n_tokens > 1 THEN
    CAST(floor(CAST(rep2 AS DOUBLE)
               / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)
               * 1000000000.0 + 0.5) AS BIGINT)
  ELSE CAST(0 AS BIGINT) END AS simpson_q9
FROM m
"""


@gate("vocab_richness", _VR_SQL)
def vocab_richness_gate(spark, sf_dir):
    """Chao1/jackknife/Simpson over the adjacent-bigram event table."""
    import os

    from lucenenet_spark.functions.textstats import vocab_richness

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return vocab_richness(docs, ngram=2)
