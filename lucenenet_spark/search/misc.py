"""Small Lucene.Net.Misc / core-reader utilities over the index tables.

- ``GetTermInfo`` (reference ``Lucene.Net.Misc/Misc/GetTermInfo.cs``):
  print docFreq + totalTermFreq for one (field, term). Here it is a
  pushed equality predicate on the term-stats table — a metadata lookup,
  never a postings scan.
- ``term_vector`` ≙ ``IndexReader.GetTermVector(docID, field)`` (reference
  ``src/Lucene.Net/Index/IndexReader.cs`` GetTermVector →
  ``Codecs/Compressing/CompressingTermVectorsReader.cs``): the per-document
  inverted view — (term, freq, positions) for one doc's field. The postings
  table IS the term-vector store here (positions ride on every posting), so
  a term vector is a pushed doc-id predicate, not a codec.
- ``collection_statistics`` ≙ ``IndexSearcher.CollectionStatistics``
  (reference ``src/Lucene.Net/Search/IndexSearcher.cs:1129-1154``): the
  per-field (maxDoc, docCount, sumDocFreq, sumTotalTermFreq) quadruple that
  feeds every Similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["term_info", "term_vector", "collection_statistics"]


def term_info(index, term: str, field: str | None = None) -> DataFrame:
    """(term, df, ttf) for one term — GetTermInfo.TermInfo semantics
    (docFreq, totalTermFreq via TermsEnum seek)."""
    fld = field or index.default_field
    stats = index.term_stats
    if "field" in stats.columns:
        stats = stats.filter(F.col("field") == fld)
    return stats.filter(F.col("term") == term).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def term_vector(index, doc_ids: DataFrame | None = None, field: str | None = None) -> DataFrame:
    """(doc_id, term, tf, first_pos) — the per-doc term vector.

    ``doc_ids``: optional one-column DataFrame restricting the docs (a
    left-semi join, so the restriction pushes into the postings scan
    instead of materializing the full corpus inversion). ``first_pos`` is
    the first occurrence position (positions are stored ascending by the
    inversion pass), standing in for the full positions array so the
    output stays hash-comparable; callers wanting every position read the
    ``positions`` column off ``index.postings`` directly."""
    fld = field or index.default_field
    post = index.postings
    if "field" in post.columns:
        post = post.filter(F.col("field") == fld)
    if doc_ids is not None:
        post = post.join(doc_ids.select("doc_id"), "doc_id", "left_semi")
    return post.select(
        "doc_id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.element_at("positions", 1).cast("long").alias("first_pos"),
    )


def collection_statistics(index, field: str | None = None) -> DataFrame:
    """One row: (field, max_doc, doc_count, sum_df, sum_ttf).

    maxDoc is collection-global; docCount counts docs with >= 1 indexed
    term in the field (Terms.DocCount); sumDocFreq is the postings count
    (Terms.SumDocFreq); sumTotalTermFreq the token count. All three field
    aggregates come off the term-stats table except docCount, which needs
    the per-doc doclens slice (dl > 0) — still metadata-sized inputs, no
    postings scan."""
    fld = field or index.default_field
    stats = index.term_stats
    if "field" in stats.columns:
        stats = stats.filter(F.col("field") == fld)
    dl = index.doclens
    if "field" in dl.columns:
        dl = dl.filter(F.col("field") == fld)
    agg = stats.agg(
        F.sum("df").cast("long").alias("sum_df"),
        F.sum("ttf").cast("long").alias("sum_ttf"),
    )
    dc = dl.filter(F.col("dl") > 0).agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
    return (
        agg.crossJoin(dc)  # two 1-row aggregates
        .select(
            F.lit(fld).alias("field"),
            F.lit(int(index.max_doc)).cast("long").alias("max_doc"),
            "doc_count",
            F.coalesce("sum_df", F.lit(0)).alias("sum_df"),
            F.coalesce("sum_ttf", F.lit(0)).alias("sum_ttf"),
        )
    )
