"""Gate registry part 5i: completing the Queries.Function ValueSource DSL
(FunctionQuery all-docs scoring, RangeMap/If/arithmetic sources, the
index-stat scalar sources, QueryValueSource with defVal) and the
BlendedInfixSuggester POSITION_RECIPROCAL blender
(Suggest/Analyzing/BlendedInfixSuggester.cs BlenderType)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _STOPS,
    _docs_table,
    _spark_score_q,
    gate,
    get_engine,
)

# ==========================================================================
# FunctionQuery(RangeMapFloatFunction(n_chars, 200..400 -> 2.0, else 0.5)
#               + ConstValueSource(1.0)):
# matches EVERY document, score IS the value source — no relevance term at
# all (FunctionQuery.cs AllScorer). Constants are exact halves, so the
# quantized score is trivially bit-stable.
# ==========================================================================
@gate(
    "function_query_rangemap",
    """
SELECT doc_id, CAST(floor((CASE WHEN n_chars BETWEEN 200 AND 400
                           THEN 2.0 ELSE 0.5 END + 1.0) * 10000 + 0.5)
                AS BIGINT) AS score_q
FROM documents
""",
)
def function_query_rangemap(spark, sf_dir):
    """FunctionQuery over RangeMapFloatFunction + SumFloatFunction +
    ConstValueSource (FunctionQuery.cs, RangeMapFloatFunction.cs): every
    live doc scored by a pure column expression in whole-stage codegen —
    one scan, no join, no shuffle."""
    from lucenenet_spark.search.valuesources import (
        const,
        function_query,
        range_map,
        sum_vs,
    )

    docs = _docs_table(spark, sf_dir)
    val = sum_vs(
        range_map(F.col("n_chars").cast("double"), 200, 400, 2.0, 0.5),
        const(1.0),
    )
    return _spark_score_q(function_query(docs, val))


# ==========================================================================
# ProductFloatFunction(TermFreqValueSource('vector'),
#                      TotalTermFreqValueSource('vector'))
#   / MaxDocValueSource — per-doc tf times two per-reader scalar constants
# resolved once on the driver (DocFreqValueSource.cs GetValues pattern).
# tf and ttf are integers < 2^53: the double product is exact, the single
# division identical IEEE on both sides.
# ==========================================================================
@gate(
    "function_stats_product",
    SQL_PRELUDE + """
SELECT doc_id,
       CAST(floor(p.tf * ts.ttf / cs.n * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN ts USING (term), cs
WHERE p.term = 'vector'
""",
)
def function_stats_product(spark, sf_dir):
    """TermFreq x TotalTermFreq / MaxDoc value sources
    (TermFreqValueSource.cs, TotalTermFreqValueSource.cs,
    MaxDocValueSource.cs): the scalars are bounded driver lookups against
    term-stats metadata, never a postings scan; the per-doc multiply stays
    in codegen."""
    from lucenenet_spark.search.valuesources import (
        max_doc,
        term_freq_source,
        total_term_freq,
    )

    idx, _, _ = get_engine(spark, sf_dir)
    tfs = term_freq_source(idx, "vector")
    score = F.col("tf") * F.lit(total_term_freq(idx, "vector")) / F.lit(max_doc(idx))
    return _spark_score_q(tfs.select("doc_id", score.alias("score")))


# ==========================================================================
# SumFloatFunction(QueryValueSource(TermQuery('vector'), defVal=0.25),
#                  LinearFloatFunction(n_chars, 0.001, 0)):
# every doc gets the BM25 score where the query matches and the default
# where it does not (QueryValueSource.cs QueryDocValues.DoubleVal), plus a
# linear doc-length term — the classic "relevance + static prior" blend.
# ==========================================================================
@gate(
    "query_valuesource_default",
    SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT d.doc_id,
       CAST(floor((coalesce(q.score, 0.25) + 0.001 * d.n_chars) * 10000 + 0.5)
            AS BIGINT) AS score_q
FROM documents d
LEFT JOIN (SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score
           FROM sc WHERE term = 'vector') q USING (doc_id)
""",
)
def query_valuesource_default(spark, sf_dir):
    """QueryValueSource with defVal composed under SumFloatFunction
    (QueryValueSource.cs): full docset LEFT-joined against the scored
    docset, coalesced to the default — the miss path is a null-fill, not a
    second query execution."""
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.valuesources import linear, query_value_source

    _, s, _ = get_engine(spark, sf_dir)
    docs = _docs_table(spark, sf_dir)
    qv = query_value_source(docs, s.scored(TermQuery("vector")), default=0.25)
    joined = qv.join(docs.select("doc_id", "n_chars"), "doc_id")
    score = F.col("value") + linear(F.col("n_chars").cast("double"), 0.001, 0.0)
    return _spark_score_q(joined.select("doc_id", score.alias("score")))


# ==========================================================================
# BlendedInfixSuggester BlenderType.POSITION_RECIPROCAL — same candidate
# set as the POSITION_LINEAR gate (gate_round5d), coefficient 1/(pos+1).
# ==========================================================================
@gate(
    "blended_infix_reciprocal",
    """
WITH ent AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface
    FROM documents
  ) GROUP BY surface
),
an AS (
  SELECT surface, weight,
         list_filter(string_split(lower(surface), ' '),
                     x -> x <> '' AND x NOT IN (""" + _STOPS + """)) AS toks
  FROM ent
),
m AS (
  SELECT surface, weight, min(i) - 1 AS minpos
  FROM (SELECT surface, weight, unnest(toks) AS tk,
               generate_subscripts(toks, 1) AS i FROM an)
  WHERE tk LIKE 'key%'
  GROUP BY surface, weight
)
SELECT surface, weight,
       CAST(floor(weight * (1.0 / (minpos + 1))) AS BIGINT) AS score
FROM m ORDER BY score DESC, weight DESC, surface ASC LIMIT 5
""",
)
def blended_infix_reciprocal(spark, sf_dir):
    """BlendedInfixSuggester POSITION_RECIPROCAL: weight discounted by
    1/(position+1) — steeper than linear, first-token matches dominate
    (BlendedInfixSuggester.cs CalculateCoefficient)."""
    from lucenenet_spark.search.suggest import BlendedInfixSuggester

    _, _, docs = get_engine(spark, sf_dir)
    ent = (
        docs.select(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("surface")
        )
        .groupBy("surface")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return BlendedInfixSuggester(ent, blender="reciprocal").lookup("key", 5)
