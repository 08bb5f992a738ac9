"""Gate registry round-5 part zzd: Katz back-off bigram scoring and
the held-out back-off (bigram OOV) rate.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import _docs_table, gate

_KZ_KCUT = 5
_Q12 = 1000000000000

# ----------------------------------------------------------------------
# katz_backoff_bigram — Katz TASSP'87 with simple-GT discounts: even
# docs train, odd docs held out (the back-off path fires on unseen
# pairs).  q12 quantize-before-sum keeps alpha integer-exact.
# ----------------------------------------------------------------------
_KZ_SQL = f"""
WITH trl AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE doc_id % 2 = 0
),
trp AS (
  SELECT t[u.i] AS w1, t[u.i + 1] AS w2
  FROM trl, unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM trp GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1 FROM big GROUP BY 1),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents WHERE doc_id % 2 = 0) GROUP BY w
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_tok FROM uni),
nr AS (SELECT cb AS r, CAST(count(*) AS BIGINT) AS n_r FROM big GROUP BY 1),
disc AS (
  SELECT b.r,
         CASE WHEN b.r < {_KZ_KCUT} AND x.n_r IS NOT NULL
              THEN CAST(b.r + 1 AS DOUBLE) * CAST(x.n_r AS DOUBLE)
                   / (CAST(b.n_r AS DOUBLE) * CAST(b.r AS DOUBLE))
              ELSE 1.0 END AS d
  FROM nr b LEFT JOIN nr x ON x.r = b.r + 1
),
seen AS (
  SELECT b.w1, b.w2,
         CAST(floor(dd.d * CAST(b.cb AS DOUBLE) / CAST(c.c1 AS DOUBLE)
                    * {_Q12} + 0.5) AS BIGINT) AS pseen_q12,
         CAST(floor(CAST(u.cnt AS DOUBLE) / CAST(t.t_tok AS DOUBLE)
                    * {_Q12} + 0.5) AS BIGINT) AS pml_q12
  FROM big b
  JOIN disc dd ON dd.r = b.cb
  JOIN ctx c USING (w1)
  JOIN uni u ON u.w = b.w2
  CROSS JOIN tot t
),
alpha AS (
  SELECT w1,
         CAST({_Q12} - sum(pseen_q12) AS BIGINT) AS left_q12,
         CAST({_Q12} - sum(pml_q12) AS BIGINT) AS den_q12
  FROM seen GROUP BY 1
),
tel AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents WHERE doc_id % 2 = 1
),
tep AS (
  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM tel, unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
),
sc AS (
  SELECT p.doc_id,
    CAST(floor(ln(
      CASE WHEN s.pseen_q12 IS NOT NULL
           THEN CAST(s.pseen_q12 AS DOUBLE) / {_Q12}
           ELSE (CAST(a.left_q12 AS DOUBLE) / CAST(a.den_q12 AS DOUBLE))
                * (CAST(u.cnt AS DOUBLE) / CAST(t.t_tok AS DOUBLE)) END
    ) * 1000000.0 + 0.5) AS BIGINT) AS lp_q6
  FROM tep p
  LEFT JOIN seen s USING (w1, w2)
  JOIN alpha a USING (w1)
  LEFT JOIN uni u ON u.w = p.w2
  CROSS JOIN tot t
  WHERE s.pseen_q12 IS NOT NULL
     OR (u.cnt IS NOT NULL AND a.left_q12 > 0 AND a.den_q12 > 0)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp_q6) AS BIGINT) AS sum_lp_q6
FROM sc GROUP BY doc_id
"""


@gate("katz_backoff_bigram", _KZ_SQL)
def katz_backoff_bigram(spark, sf_dir):
    """Katz back-off per-doc bigram logprobs, held-out odd docs."""
    import pyspark.sql.functions as F

    from lucenenet_spark.functions.lm_quality import katz_backoff_bigram_logprob

    docs = _docs_table(spark, sf_dir)
    return katz_backoff_bigram_logprob(
        docs.filter(F.col("doc_id") % 2 == 1),
        train=docs.filter(F.col("doc_id") % 2 == 0),
        k_cut=_KZ_KCUT,
    )


# ----------------------------------------------------------------------
# backoff_rate — bigram-unit OOV of the held-out split: the fraction
# of adjacent pairs the Katz/KN back-off path must cover.
# ----------------------------------------------------------------------
_OOV_SQL = """
WITH trv AS (
  SELECT DISTINCT t[u.i] || ' ' || t[u.i + 1] AS w
  FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE doc_id % 2 = 0),
       unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
),
teu AS (
  SELECT doc_id, t[u.i] || ' ' || t[u.i + 1] AS w
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE doc_id % 2 = 1),
       unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(floor(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS oov_q6
FROM teu LEFT JOIN trv v USING (w)
GROUP BY doc_id
"""


@gate("backoff_rate", _OOV_SQL)
def backoff_rate(spark, sf_dir):
    """Per-doc unseen-bigram rate of the held-out split."""
    import pyspark.sql.functions as F

    from lucenenet_spark.functions.lm_quality import oov_rate

    docs = _docs_table(spark, sf_dir)
    return oov_rate(
        docs.filter(F.col("doc_id") % 2 == 1),
        train=docs.filter(F.col("doc_id") % 2 == 0),
        unit="bigram",
    )
