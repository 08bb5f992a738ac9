"""Line-level boilerplate dedup (RefinedWeb / CCNet shape).

Web-pipeline operator, not a reference port: navigation chrome, cookie
banners and footers repeat VERBATIM across pages of a host, so training
pipelines drop any line whose exact hash appears in >= min_df documents
(CCNet dedupes on paragraph hashes computed over a normalized form;
RefinedWeb §3.2 removes exact-duplicate lines before document-level
MinHash).  C4 does the same at sentence granularity ("three-sentence
span" dedup).

Scale shape (the part that must survive 100 TB):
- One explode of docs into (doc_id, line_no, line_hash) — line text
  itself is NOT carried through the shuffle, only the 16-byte hash
  prefix, so the wide text column stays in the scan stage.
- Line df via groupBy(line_hash) with map-side partial aggregation;
  boilerplate lines are by definition heavy keys, but the aggregate is
  a count (associative, no value list), so skew costs one hot partition
  of longs, not memory.
- The survivor rebuild joins the (doc_id, line_no) keep-list back and
  re-assembles with sort_array + array_join in whole-stage codegen —
  no Python worker anywhere.
- `min_df` guards the pathological all-lines-unique corpus: with
  min_df=2 the join's right side holds only hashes seen twice, which
  for web text is a small fraction of distinct lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(docs: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    """(doc_id, line_no, line, line_hash) — posexplode keeps the original
    order so survivors can be reassembled byte-identically.  `sep` must be
    a literal separator (it is regex-escaped for the split and reused
    verbatim for the rebuild join)."""
    import re as _re

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "line_no", "line"
        ),
    ).withColumn("line_hash", F.md5(F.col("line")))


def duplicated_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_df: int = 2,
) -> DataFrame:
    """(line_hash, line_df) for every line occurring in >= min_df DISTINCT
    documents — the boilerplate dictionary.  Distinct per doc first so a
    line repeated inside one page doesn't count as cross-document."""
    return (
        _lines(docs, text_col, id_col, sep)
        .select("doc_id", "line_hash")
        .distinct()
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
    )


def strip_duplicate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_df: int = 2,
) -> DataFrame:
    """Remove every line whose exact hash appears in >= min_df documents;
    returns (doc_id, text, lines_kept, lines_dropped).  Documents whose
    every line is boilerplate survive with empty text (the caller's
    length filter drops them — same staging as RefinedWeb).

    The anti-join side is the boilerplate dictionary (small by
    construction), so Catalyst broadcasts it; the rebuild groups by
    doc_id over the SAME partitioning the explode produced."""
    lines = _lines(docs, text_col, id_col, sep)
    boiler = duplicated_lines(docs, text_col, id_col, sep, min_df)
    kept = lines.join(boiler, "line_hash", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).alias("lines_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("lines_total"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce(F.col("lines_kept"), F.lit(0)).cast("long").alias("lines_kept"),
            (F.col("lines_total") - F.coalesce(F.col("lines_kept"), F.lit(0)))
            .cast("long")
            .alias("lines_dropped"),
        )
    )
