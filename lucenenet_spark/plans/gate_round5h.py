"""Gate registry part 5h: the last two portable reference seams —
GetTermInfo (Lucene.Net.Misc/Misc/GetTermInfo.cs) and the
Queries.Function ValueSource family driven through BoostedQuery
(Lucene.Net.Queries/Function/BoostedQuery.cs with
ReciprocalFloatFunction + ScaleFloatFunction value sources)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _docs_table,
    _spark_score_q,
    gate,
    get_engine,
)

# ==========================================================================
# GetTermInfo: docFreq + totalTermFreq for one term — a pushed equality
# predicate on the term-stats table, O(metadata) not O(postings).
# ==========================================================================
@gate(
    "get_term_info",
    SQL_PRELUDE + """
SELECT term, df, ttf FROM ts WHERE term = 'vector'
""",
)
def get_term_info(spark, sf_dir):
    """GetTermInfo.TermInfo('text', 'vector') — docFreq/totalTermFreq
    metadata lookup (GetTermInfo.cs)."""
    from lucenenet_spark.search.misc import term_info

    idx, _, _ = get_engine(spark, sf_dir)
    return term_info(idx, "vector")


# ==========================================================================
# BoostedQuery(TermQuery('vector'), recip(scale(n_chars, 0..1), 2, 1.5, .5)):
# BM25 score multiplied per-doc by a value source — the reciprocal of the
# corpus-min/max-scaled document length in chars. Both sides compute the
# identical double expression:
#   scaled = (n_chars - mn) * ((1.0 - 0.0) / (mx - mn)) + 0.0
#   score  = bm25 * (1.5 / (2.0 * scaled + 0.5))
# so floor(score*1e4+0.5) is bit-stable (gate.py module docstring).
# ==========================================================================
_FUNC_SQL = SQL_PRELUDE + "," + _SQL_SCORED + """
, mm AS (
  SELECT CAST(min(n_chars) AS DOUBLE) AS mn, CAST(max(n_chars) AS DOUBLE) AS mx
  FROM documents
)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT s.doc_id,
         (idf * 2.2 * tf / (tf + nrm))
           * (1.5 / (2.0 * ((CAST(d.n_chars AS DOUBLE) - mm.mn)
                            * ((1.0 - 0.0) / (mm.mx - mm.mn)) + 0.0)
                     + 0.5)) AS score
  FROM sc s JOIN documents d USING (doc_id), mm
  WHERE s.term = 'vector'
)
"""


@gate("function_recip_scale", _FUNC_SQL)
def function_recip_scale(spark, sf_dir):
    """BoostedQuery with ReciprocalFloatFunction over ScaleFloatFunction
    (BoostedQuery.cs, ReciprocalFloatFunction.cs, ScaleFloatFunction.cs):
    one scored-docset x stored-fields join, the min/max scale info a
    broadcast 1-row aggregate, the multiply in whole-stage codegen."""
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.valuesources import (
        boosted_scores,
        recip,
        scale_min_max,
    )

    _, s, _ = get_engine(spark, sf_dir)
    docs = _docs_table(spark, sf_dir)
    vals = scale_min_max(docs.select("doc_id", "n_chars"), "n_chars", 0.0, 1.0)
    vals = vals.withColumn("vs", recip(F.col("scaled"), m=2.0, a=1.5, b=0.5))
    scored = s.scored(TermQuery("vector")).select("doc_id", "score")
    return _spark_score_q(boosted_scores(scored, vals, "vs"))
