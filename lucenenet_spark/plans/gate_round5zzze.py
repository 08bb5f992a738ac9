"""Gate registry round-5 part zzze: Flesch/Flesch-Kincaid readability
scores and LZ77-window repetition coverage (compression-ratio proxy).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, get_engine

# ----------------------------------------------------------------------
# readability_scores — 30 hardest documents by Flesch Reading Ease.
# ----------------------------------------------------------------------
_RD_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(greatest(1, len(regexp_extract_all(wd, '[aeiouy]+')))) AS BIGINT)
           AS n_syllables
  FROM w WHERE wd <> '' GROUP BY doc_id
),
sen AS (
  SELECT doc_id,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
           AS n_sentences
  FROM documents
),
d AS (
  SELECT a.doc_id, a.n_words, s.n_sentences, a.n_syllables,
         CAST(a.n_words AS DOUBLE) / CAST(s.n_sentences AS DOUBLE) AS wps,
         CAST(a.n_syllables AS DOUBLE) / CAST(a.n_words AS DOUBLE) AS spw
  FROM agg a JOIN sen s USING (doc_id) WHERE a.n_words > 0
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(floor((206.835 - 1.015 * wps - 84.6 * spw) * 10000.0 + 0.5) AS BIGINT)
         AS fre_q4,
       CAST(floor((0.39 * wps + 11.8 * spw - 15.59) * 10000.0 + 0.5) AS BIGINT)
         AS fkgl_q4
FROM d
ORDER BY fre_q4 ASC, doc_id ASC LIMIT 30
"""


@gate("readability_scores", _RD_SQL)
def readability_scores_gate(spark, sf_dir):
    """30 hardest docs by Flesch Reading Ease (q4), with sub-measures."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.textstats import readability_scores

    _, _, docs = get_engine(spark, sf_dir)
    return (
        readability_scores(docs)
        .orderBy(F.asc("fre_q4"), F.asc("doc_id"))
        .limit(30)
    )


# ----------------------------------------------------------------------
# lz_window_coverage — 30 most locally-repetitive documents (the
# "compresses too well" screen), exact integer ppm.
# ----------------------------------------------------------------------
_LZ_GRAM, _LZ_WIN = 8, 256

_LZ_SQL = f"""
WITH pos AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i, substr(text, CAST(i AS INT), {_LZ_GRAM}) AS g
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(length(text) - {_LZ_GRAM - 1}, 0))) AS i
    FROM documents
  )
),
rep AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_repeated FROM (
    SELECT DISTINCT a.doc_id, a.i
    FROM pos a JOIN pos b
      ON a.doc_id = b.doc_id AND a.g = b.g
     AND b.i < a.i AND a.i - b.i <= {_LZ_WIN}
  ) GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM pos GROUP BY doc_id)
SELECT t.doc_id, t.n_grams,
       CAST(coalesce(r.n_repeated, 0) AS BIGINT) AS n_repeated,
       CAST(coalesce(r.n_repeated, 0) * 1000000 // t.n_grams AS BIGINT) AS rep_ppm
FROM tot t LEFT JOIN rep r USING (doc_id)
ORDER BY rep_ppm DESC, doc_id ASC LIMIT 30
"""


@gate("lz_window_coverage", _LZ_SQL)
def lz_window_coverage_gate(spark, sf_dir):
    """30 most LZ-window-repetitive docs (repeated 8-gram ppm)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.repetition import lz_window_coverage

    _, _, docs = get_engine(spark, sf_dir)
    return (
        lz_window_coverage(docs, gram=_LZ_GRAM, window=_LZ_WIN)
        .orderBy(F.desc("rep_ppm"), F.asc("doc_id"))
        .limit(30)
    )
