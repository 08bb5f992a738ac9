"""Index sorting — the Misc/Index/Sorter family re-expressed.

Reference: ``Lucene.Net.Misc/Index/Sorter/SortingMergePolicy.cs`` (wraps a
merge so the merged segment's docs come out in sort-key order),
``Sorter.cs`` (computes the old->new doc permutation) and
``SortingAtomicReader.cs`` (view of a segment with docs, postings and
norms permuted). The payoff is ``EarlyTerminatingSortingCollector.cs``:
when the index order IS the sort order, a sorted query can stop after
collecting k docs per segment.

Spark mapping: the permutation is :func:`assign_doc_ids` on the sort key
— the scalable two-phase dense rank (range-partition + per-partition
offsets, no global window) — followed by a normal :func:`build_index`
over the re-keyed corpus. Every derived table (postings, doclens, stats,
norms) is rebuilt against the new docIDs in one pass, which is exactly
what SortingAtomicReader simulates lazily. Corpus-wide statistics (df,
ttf, avgdl, maxDoc) are permutation-invariant, so every BM25 score is
unchanged — only the docIDs move; tests assert both properties.

At cluster scale the re-sort is one range-shuffle of the corpus; the
sorted index then serves ``ORDER BY sort_key LIMIT k`` queries as a
docID-ordered scan with per-partition early termination
(search/collectors.py early_terminating_topk) instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex, assign_doc_ids, build_index

__all__ = ["sorted_reindex", "sort_permutation", "block_join_permutation"]


def sort_permutation(docs: DataFrame, sort_key: str, id_col: str = "doc_id") -> DataFrame:
    """(old_id, new_id) — Sorter.Sort's DocMap as a DataFrame: new_id is
    the dense rank of ``sort_key`` (ties broken by old id to keep the
    permutation total, Sorter.cs's stable sort)."""
    keyed = docs.select(
        F.col(id_col).alias("old_id"),
        F.struct(F.col(sort_key), F.col(id_col)).alias("_sk"),
    )
    return assign_doc_ids(keyed, order_col="_sk").select(
        "old_id", F.col("doc_id").alias("new_id")
    )


def sorted_reindex(
    docs: DataFrame,
    sort_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **build_kw,
) -> tuple[InvertedIndex, DataFrame]:
    """Rebuild the index with docIDs assigned in ``sort_key`` order.

    Returns ``(index, sorted_docs)`` where ``sorted_docs`` carries the new
    ``doc_id`` plus every original column — the SortingAtomicReader view.
    The sort key need not be unique: the old id is appended as a
    tie-break, mirroring the reference's stable permutation.
    """
    keyed = docs.withColumn(
        "_sk", F.struct(F.col(sort_key), F.col(id_col))
    ).drop(id_col)
    sorted_docs = assign_doc_ids(keyed, order_col="_sk").drop("_sk")
    idx = build_index(sorted_docs, text_col=text_col, id_col="doc_id", **build_kw)
    return idx, sorted_docs


def block_join_permutation(
    parents: DataFrame,
    children: DataFrame,
    *,
    parent_key: str,
    parent_sort: str,
    child_sort: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(old_id, new_id, is_parent) — BlockJoinComparerSource's DocMap for
    parent/child block indexes.

    Reference ``Misc/Index/Sorter/BlockJoinComparatorSource.cs``: a
    SortingMergePolicy comparer that reorders WHOLE blocks by the
    parent's sort value without breaking block contiguity; children stay
    before their parent inside the block (the reference's child-then-
    parent block layout), ordered by ``child_sort`` (old-id order when
    None, its ``SortField.FIELD_DOC`` default).

    Relationally the block is the ``parent_key`` group, so the
    permutation is a dense rank of the composite key (parent sort value,
    parent old id, is-parent flag, child sort, old id) — one equi-join
    to carry the parent's sort value onto its children, then the same
    scalable two-phase rank :func:`assign_doc_ids` runs everywhere else
    (no global window). Children whose parent is absent are dropped,
    mirroring the reference's requirement that every block ends with a
    parent-filter hit.
    """
    p = parents.select(
        F.col(parent_key).alias("_pk"),
        F.col(id_col).cast("long").alias("old_id"),
        F.col(parent_sort).alias("_psort"),
    )
    if child_sort is None:
        child_sort_col = F.col(id_col).cast("long")
        parent_pad = F.lit(0).cast("long")
    else:
        child_sort_col = F.col(child_sort)
        parent_pad = F.lit(None).cast(children.schema[child_sort].dataType)
    pside = p.select(
        "old_id",
        F.struct(
            F.col("_psort").alias("_psort"),
            F.col("old_id").alias("_pold"),
            F.lit(1).alias("_in_block"),  # the parent closes its block
            parent_pad.alias("_csort"),
            F.col("old_id").alias("_cold"),
        ).alias("_sk"),
        F.lit(True).alias("is_parent"),
    )
    c = children.select(
        F.col(parent_key).alias("_pk"),
        F.col(id_col).cast("long").alias("old_id"),
        child_sort_col.alias("_csort"),
    )
    cside = (
        c.join(p.select("_pk", F.col("old_id").alias("_pold"), "_psort"), "_pk")
        .select(
            "old_id",
            F.struct(
                F.col("_psort").alias("_psort"),
                F.col("_pold").alias("_pold"),
                F.lit(0).alias("_in_block"),
                F.col("_csort").alias("_csort"),
                F.col("old_id").alias("_cold"),
            ).alias("_sk"),
            F.lit(False).alias("is_parent"),
        )
    )
    rows = pside.unionByName(cside)
    return assign_doc_ids(rows, order_col="_sk").select(
        "old_id", F.col("doc_id").alias("new_id"), "is_parent"
    )
