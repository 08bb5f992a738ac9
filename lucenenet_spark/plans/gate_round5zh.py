"""Gate registry round-5 part zh: diversity evaluation — alpha-DCG@10
and intent-aware precision@10 over the lang-aspect split.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_DIV_TERM = "vector"
_DIV_K = 10

# ----------------------------------------------------------------------
# alpha_ndcg_topk — Clarke SIGIR'08 alpha-DCG@10, alpha=0.5 (novelty
# factors are exact powers of two), aspects = lang; raw alpha-DCG plus
# aspect coverage (the ideal ordering is NP-hard, so no normalization).
# ----------------------------------------------------------------------
_ALPHA_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
run AS (
  SELECT r.doc_id, r.rank, d.lang AS aspect
  FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
    FROM (
      SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
      FROM ({_tsc(_DIV_TERM)})
    ) QUALIFY rank <= {_DIV_K}
  ) r JOIN documents d USING (doc_id)
),
nv AS (
  SELECT rank, aspect,
         CAST(row_number() OVER (PARTITION BY aspect ORDER BY rank) - 1 AS BIGINT) AS c
  FROM run
),
contrib AS (
  SELECT CAST(floor(
           (1.0 / CAST(CAST(1 AS BIGINT) << CAST(c AS INTEGER) AS DOUBLE))
           / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0))
           * 1000000000.0 + 0.5) AS BIGINT) AS cq,
         aspect
  FROM nv
)
SELECT CAST({_DIV_K} AS BIGINT) AS k,
       CAST(count(DISTINCT aspect) AS BIGINT) AS n_aspects_covered,
       CAST(sum(cq) AS BIGINT) AS alpha_dcg_q9
FROM contrib
"""


@gate("alpha_ndcg_topk", _ALPHA_SQL)
def alpha_ndcg_topk(spark, sf_dir):
    """alpha-DCG@10 (alpha=0.5) of the BM25 ranking, lang aspects."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.quality import alpha_dcg_at_k

    _, s, _ = get_engine(spark, sf_dir)
    return alpha_dcg_at_k(s, _docs_table(spark, sf_dir), _DIV_TERM, k=_DIV_K)


# ----------------------------------------------------------------------
# intent_aware_precision — Agrawal WSDM'09 IA-P@10: per-aspect P@k
# weighted by aspect priors among matching docs; one exact integer
# numerator, one floor division.
# ----------------------------------------------------------------------
_IAP_MIN_TF = 2

_IAP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
matched AS (
  SELECT p.doc_id, p.tf >= {_IAP_MIN_TF} AS rel, d.lang AS aspect
  FROM post p JOIN documents d USING (doc_id)
  WHERE p.term = '{_DIV_TERM}'
),
prior AS (SELECT aspect, CAST(count(*) AS BIGINT) AS cnt FROM matched GROUP BY aspect),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM matched),
topk AS (
  SELECT r.doc_id, m.aspect, m.rel
  FROM (
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
    FROM (
      SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
      FROM ({_tsc(_DIV_TERM)})
    ) QUALIFY rank <= {_DIV_K}
  ) r JOIN matched m USING (doc_id)
),
relk AS (
  SELECT aspect, CAST(count(*) AS BIGINT) AS relk
  FROM topk WHERE rel GROUP BY aspect
),
num AS (
  SELECT CAST(coalesce(sum(p.cnt * coalesce(r.relk, 0)), 0) AS BIGINT) AS num
  FROM prior p LEFT JOIN relk r USING (aspect)
)
SELECT CAST({_DIV_K} AS BIGINT) AS k,
       tot.total AS total_matching,
       CAST(floor(CAST(num.num AS DOUBLE) * 1000000.0
                  / CAST(tot.total * {_DIV_K} AS DOUBLE)) AS BIGINT) AS ia_p_q6
FROM num, tot
"""


@gate("intent_aware_precision", _IAP_SQL)
def intent_aware_precision(spark, sf_dir):
    """IA-P@10 over lang aspects with tf-convention relevance."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.quality import intent_aware_precision as _iap

    _, s, _ = get_engine(spark, sf_dir)
    return _iap(
        s, _docs_table(spark, sf_dir), _DIV_TERM, k=_DIV_K, min_tf=_IAP_MIN_TF
    )
