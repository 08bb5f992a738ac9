"""Gate registry part 5j: CustomScoreQuery with multiple value sources
(Lucene.Net.Queries/CustomScoreQuery.cs + CustomScoreProvider.cs),
DuplicateFilter keep-last (Lucene.Net.Sandbox/Queries/DuplicateFilter.cs),
the ord()/rord() field sources (OrdFieldSource.cs /
ReverseOrdFieldSource.cs), and index sorting — a full permuted rebuild
(Misc/Index/Sorter/SortingMergePolicy.cs, SortingAtomicReader.cs)."""

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
# CustomScoreQuery(TermQuery('vector'),
#                  LinearFloatFunction(n_chars, 0.001, 1.0),
#                  ReciprocalFloatFunction(n_chars, 1, 1000, 10)):
# default provider — subQueryScore * vs1 * vs2 (CustomScoreProvider.cs:80-87
# multiplies through the valSrcScores array). Identical double expression
# both sides, quantized.
# ==========================================================================
@gate(
    "custom_score_query",
    SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT s.doc_id,
         (idf * 2.2 * tf / (tf + nrm))
           * (0.001 * d.n_chars + 1.0)
           * (1000.0 / (1.0 * d.n_chars + 10.0)) AS score
  FROM sc s JOIN documents d USING (doc_id)
  WHERE s.term = 'vector'
)
""",
)
def custom_score_query(spark, sf_dir):
    """CustomScoreQuery chaining two value sources under the default
    provider: one scored-docset x stored-fields join, both multiplies in
    whole-stage codegen — never a second relevance pass."""
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.valuesources import custom_scores, linear, recip

    _, s, _ = get_engine(spark, sf_dir)
    docs = _docs_table(spark, sf_dir)
    x = F.col("n_chars").cast("double")
    vals = docs.select(
        "doc_id",
        linear(x, 0.001, 1.0).alias("vs1"),
        recip(x, m=1.0, a=1000.0, b=10.0).alias("vs2"),
    )
    scored = s.scored(TermQuery("vector")).select("doc_id", "score")
    return _spark_score_q(custom_scores(scored, vals, ["vs1", "vs2"]))


# ==========================================================================
# DuplicateFilter('lang', KM_USE_LAST_OCCURRENCE) wrapped around
# TermQuery('vector'): of the docs whose lang value's LAST corpus
# occurrence they are, those matching the term (FilteredQuery shape —
# DuplicateFilter.cs builds the bitset per segment, the query intersects).
# ==========================================================================
@gate(
    "duplicate_filter_last",
    SQL_PRELUDE + """
SELECT k.doc_id, k.lang
FROM (SELECT lang, max(doc_id) AS doc_id FROM documents GROUP BY lang) k
JOIN (SELECT DISTINCT doc_id FROM post WHERE term = 'vector') p USING (doc_id)
""",
)
def duplicate_filter_last(spark, sf_dir):
    """DuplicateFilter keep-last per lang intersected with a term docset:
    the filter side is one partial aggregate (a row per DISTINCT key, not
    per doc), broadcast into the join at any corpus size."""
    from lucenenet_spark.search.filters import duplicate_filter
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    docs = _docs_table(spark, sf_dir)
    keep = duplicate_filter(docs, "lang", keep="last")
    hits = s.docset(TermQuery("vector")).select("doc_id")
    return (
        keep.join(hits, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang")
    )


# ==========================================================================
# ord('lang') / rord('lang') — FieldCache ordinals over the 5-value lang
# dictionary, numbered from 1; rord(greatest)=1
# (ReverseOrdFieldSource.cs's apple/banana/pear example).
# ==========================================================================
@gate(
    "ord_field_source",
    """
SELECT doc_id, ord, CAST((SELECT count(DISTINCT lang) FROM documents) - ord + 1
                         AS BIGINT) AS rord
FROM (
  SELECT doc_id, CAST(dense_rank() OVER (ORDER BY lang) AS BIGINT) AS ord
  FROM documents
)
""",
)
def ord_field_source(spark, sf_dir):
    """OrdFieldSource/ReverseOrdFieldSource: the ordinal dictionary is
    built over DISTINCT values (a tiny window) and broadcast-joined back —
    no global sort of the docset, unlike a naive dense_rank over all
    rows."""
    from lucenenet_spark.search.valuesources import ord_field_source as ords

    docs = _docs_table(spark, sf_dir)
    return ords(docs, "lang")


# ==========================================================================
# Index sorting: rebuild the index with docIDs assigned in (n_chars,
# old_id) order — SortingMergePolicy's sorted segments as one range
# shuffle. BM25 stats are permutation-invariant, so each doc keeps its
# exact score; only the docIDs move (Sorter.cs DocMap).
# ==========================================================================
@gate(
    "index_sorting_term",
    SQL_PRELUDE + "," + _SQL_SCORED + """
, perm AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS new_id
  FROM documents
)
SELECT perm.new_id AS doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score
      FROM sc WHERE term = 'vector') q
JOIN perm USING (doc_id)
""",
)
def index_sorting_term(spark, sf_dir):
    """Sorted reindex (index/sorter.py sorted_reindex): assign_doc_ids'
    two-phase dense rank permutes the corpus in one range shuffle, then a
    normal rebuild re-derives postings/doclens/stats against the new
    IDs — SortingAtomicReader materialized instead of simulated."""
    from lucenenet_spark.index.sorter import sorted_reindex
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = _docs_table(spark, sf_dir)
    idx, _ = sorted_reindex(docs.select("doc_id", "text", "n_chars"), "n_chars")
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))
