"""Gate registry round-5 part zf: RAKE keyphrases and the MinHash-LSH
precision/recall audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _STOPS, gate
from lucenenet_spark.plans.gate_pipeline import (
    _MAX_BUCKET,
    _SHINGLE_DF_CAP,
    _lsh_sql_ctes,
)

# ----------------------------------------------------------------------
# rake_keyphrases — Rose et al. 2010: stopword-delimited candidate
# runs (<= 4 words), scored by sum of word deg/freq ratios.  One
# cumulative sum segments the runs; exact integer counts, quantized
# word ratios, integer phrase sums.
# ----------------------------------------------------------------------
_RAKE_MAXW = 4
_RAKE_K = 20

_RAKE_SQL = SQL_PRELUDE + f""",
fl AS (
  SELECT doc_id, term AS w, pos,
         CASE WHEN term = '' OR term IN ({_STOPS}) THEN 1 ELSE 0 END AS st
  FROM tok
),
rn AS (
  SELECT doc_id, w, pos, st,
         sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM fl
),
ph AS (
  SELECT doc_id, run_id,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS n_words
  FROM rn WHERE st = 0
  GROUP BY doc_id, run_id
  HAVING count(*) <= {_RAKE_MAXW}
),
occ AS (
  SELECT phrase, n_words, unnest(string_split(phrase, ' ')) AS w FROM ph
),
wstat AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(n_words) AS BIGINT) AS deg
  FROM occ GROUP BY w
),
ws AS (
  SELECT w,
         CAST(floor(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) * 1000000.0 + 0.5)
              AS BIGINT) AS ws_q
  FROM wstat
),
ptype AS (
  SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_occurrences
  FROM ph GROUP BY phrase
),
psc AS (
  SELECT p.phrase, p.n_words, p.n_occurrences,
         CAST(sum(ws.ws_q) AS BIGINT) AS score_q
  FROM (SELECT phrase, n_words, n_occurrences,
               unnest(string_split(phrase, ' ')) AS w
        FROM ptype) p
  JOIN ws USING (w)
  GROUP BY p.phrase, p.n_words, p.n_occurrences
)
SELECT phrase, n_words, n_occurrences, score_q
FROM psc ORDER BY score_q DESC, phrase ASC LIMIT {_RAKE_K}
"""


@gate("rake_keyphrases", _RAKE_SQL)
def rake_keyphrases(spark, sf_dir):
    """Top-20 RAKE keyphrases over the corpus."""
    from lucenenet_spark.functions.textstats import rake_keyphrases as _rake
    from lucenenet_spark.plans.gate import _docs_table

    return _rake(_docs_table(spark, sf_dir), max_words=_RAKE_MAXW, k=_RAKE_K)


# ----------------------------------------------------------------------
# lsh_quality_audit — precision/recall of the production LSH candidate
# generator vs exact Jaccard >= 0.5 over the same df-capped shingles
# (the banding s-curve, measured instead of trusted).  Oracle reuses
# the gate_pipeline LSH CTE chain verbatim.
# ----------------------------------------------------------------------
_AUDIT_THR_PPM = 500_000

_AUDIT_SQL = SQL_PRELUDE + _lsh_sql_ctes() + f""",
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsz FROM sh GROUP BY doc_id),
iv AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b
  FROM iv JOIN sz x ON x.doc_id = doc_a JOIN sz y ON y.doc_id = doc_b
  WHERE inter * 1000000 >= {_AUDIT_THR_PPM} * (x.nsz + y.nsz - inter)
),
m AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(count(*) AS BIGINT)
          FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS tp
)
SELECT n_truth, n_cand, tp,
       CASE WHEN n_cand > 0 THEN tp * 1000000 // n_cand ELSE 0 END AS precision_ppm,
       CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth ELSE 0 END AS recall_ppm
FROM m
"""


@gate("lsh_quality_audit", _AUDIT_SQL)
def lsh_quality_audit(spark, sf_dir):
    """Precision/recall of minhash_lsh_pairs vs exact Jaccard >= 0.5."""
    from lucenenet_spark.functions.dedup import lsh_quality_audit as _audit
    from lucenenet_spark.plans.gate import _docs_table

    return _audit(
        _docs_table(spark, sf_dir),
        jaccard_threshold_ppm=_AUDIT_THR_PPM,
        df_cap=_SHINGLE_DF_CAP,
        max_bucket_size=_MAX_BUCKET,
    )
