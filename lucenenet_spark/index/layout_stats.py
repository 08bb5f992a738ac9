"""Index-layout accounting: what the reference's storage decisions
save, measured on this engine's own tables.

* ``term_dict_prefix_stats`` — front-coding benefit of the sorted term
  dictionary.  The reference's BlockTree term dict shares prefixes
  inside 25-48-entry blocks (SURVEY §2.3 "Term dict writer",
  src/Lucene.Net/Codecs/BlockTreeTermsWriter.cs:57-64); this measures
  the same quantity on our term table: bytes to store every term raw
  vs. sorted front-coding (each term stores only its suffix after the
  longest common prefix with its predecessor).  One window over the
  sorted dictionary, all exact integers.

* ``index_options_size_audit`` — the FieldInfo.IndexOptions tradeoff
  (DOCS_ONLY | DOCS_AND_FREQS | ..._AND_POSITIONS,
  src/Lucene.Net/Index/FieldInfo.cs:316-356) priced on the real
  postings: how many integers each level persists.  This is the sizing
  question every schema review asks before enabling phrase queries on
  a 100 TB field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def term_dict_prefix_stats(idx: InvertedIndex, field: str | None = None) -> DataFrame:
    """One row (n_terms, raw_bytes, front_bytes, savings_ppm).

    front_bytes charges each term len(term) - lcp(term, prev term) in
    sorted order (the first term is stored whole).  lcp via a
    char-zip equality array and the position of its first mismatch —
    pure Column ops, no UDF.
    """
    fld = field or idx.default_field
    terms = idx.term_stats.filter(F.col("field") == fld).select("term")
    w = Window.orderBy("term")
    t = terms.withColumn("prev", F.lag("term").over(w))
    cur_c = F.split(F.col("term"), "")
    prev_c = F.split(F.col("prev"), "")
    eq = F.zip_with(
        cur_c,
        prev_c,
        lambda x, y: F.when(
            x.isNotNull() & y.isNotNull() & (x == y), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    first_zero = F.array_position(eq, 0)  # 1-based; 0 when no mismatch
    lcp = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        F.when(
            first_zero == 0,
            F.least(F.length("term"), F.length("prev")),
        ).otherwise(first_zero - F.lit(1))
    )
    sized = t.select(
        F.length("term").cast("long").alias("raw"),
        (F.length("term") - lcp).cast("long").alias("front"),
    )
    agg = sized.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum("raw").cast("long").alias("raw_bytes"),
        F.sum("front").cast("long").alias("front_bytes"),
    )
    return agg.select(
        "n_terms",
        "raw_bytes",
        "front_bytes",
        F.floor(
            (F.col("raw_bytes") - F.col("front_bytes")).cast("double")
            / F.col("raw_bytes").cast("double")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("savings_ppm"),
    )


def index_options_size_audit(idx: InvertedIndex, field: str | None = None) -> DataFrame:
    """One row (n_postings, ints_docs_only, ints_docs_freqs,
    ints_positions): integers persisted per IndexOptions level —
    doc deltas alone, + per-posting tf, + one position per occurrence.
    """
    fld = field or idx.default_field
    p = idx.postings.filter(F.col("field") == fld)
    agg = p.agg(
        F.count("*").cast("long").alias("n_postings"),
        F.sum(F.size("positions")).cast("long").alias("n_positions"),
    )
    return agg.select(
        "n_postings",
        F.col("n_postings").alias("ints_docs_only"),
        (F.col("n_postings") * 2).cast("long").alias("ints_docs_freqs"),
        (F.col("n_postings") * 2 + F.col("n_positions"))
        .cast("long")
        .alias("ints_positions"),
    )


def roaring_docidset_audit(
    docset: DataFrame, block_bits: int = 16
) -> DataFrame:
    """Per-block array/bitmap/inverse encoding choice for a doc-id set —
    the successor engine's RoaringDocIdSet (its filter-cache format;
    Chambi, Lemire et al., "Better bitmap performance with Roaring
    bitmaps", SPE 2016).

    The doc space splits into 2^block_bits-doc blocks; a block holding
    ``card`` docs is stored as

    - a sorted short array (2 bytes/doc) when card < block_size/16,
    - the COMPLEMENT as a short array when the block is nearly full
      (card > block_size - block_size/16) — the engine's dense trick,
    - an 8-bits-per-doc-slot fixed bitmap (block_size/8 bytes) between.

    Output: one row per non-empty block (block_id, card, encoding,
    bytes) — exact integers, so the audit doubles as a driver gate.
    The thresholds keep the engine's 4096/65536 proportions at any
    block_bits, letting tests exercise all three encodings on small
    corpora.
    """
    if block_bits < 4:
        raise ValueError("block_bits must be >= 4 so the array threshold is nonzero")
    block_size = 1 << block_bits
    thr = block_size >> 4
    per = docset.select(
        (F.col("doc_id") / F.lit(block_size)).cast("long").alias("block_id")
    ).groupBy("block_id").agg(F.count(F.lit(1)).cast("long").alias("card"))
    enc = (
        F.when(F.col("card") < thr, F.lit("array"))
        .when(F.col("card") > block_size - thr, F.lit("inverse"))
        .otherwise(F.lit("bitmap"))
    )
    nbytes = (
        F.when(F.col("card") < thr, 2 * F.col("card"))
        .when(F.col("card") > block_size - thr, 2 * (F.lit(block_size) - F.col("card")))
        .otherwise(F.lit(block_size // 8))
    )
    return per.select(
        "block_id", "card", enc.alias("encoding"), nbytes.cast("long").alias("n_bytes")
    )


def zonemap_prune_audit(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    block_size: int = 128,
    layout_name: str = "layout",
) -> DataFrame:
    """Zone-map (block min/max) pruning audit — Moerkotte, "Small
    Materialized Aggregates" (VLDB 1998), the mechanism behind parquet
    row-group statistics and this engine's posting-block skip data.

    Rows are laid out in ``block_size``-row blocks in ``order_cols``
    order (the last order col must make the order total, e.g. a unique
    id); per block the zone map keeps min/max of ``value_col``; a
    predicate ``value BETWEEN lo AND hi`` skips every block whose
    [min, max] misses the interval.  One summary row per call:

        (layout, n_blocks, n_pruned, rows_scanned, rows_matched)

    rows_scanned counts rows in SURVIVING blocks — the true read cost —
    against rows_matched, the selectivity.  Running it for the natural
    layout and a value-sorted layout prices index sorting: sorted
    layouts concentrate matches in few blocks, so n_pruned jumps while
    rows_matched stays fixed.  (The single global window here is the
    gate-scale stand-in for per-file zone maps.)
    """
    if block_size < 1:
        raise ValueError("block_size must be >= 1")
    if lo > hi:
        raise ValueError("lo must be <= hi")
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    v = F.col(value_col).cast("double")
    blocks = (
        df.withColumn("_blk", ((F.row_number().over(w) - 1) / F.lit(block_size)).cast("long"))
        .groupBy("_blk")
        .agg(
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.when((v >= lo) & (v <= hi), 1).otherwise(0)).cast("long").alias("matched"),
        )
    )
    pruned = (F.col("vmax") < lo) | (F.col("vmin") > hi)
    return blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(pruned, 1).otherwise(0)).cast("long").alias("n_pruned"),
        F.sum(F.when(pruned, 0).otherwise(F.col("cnt"))).cast("long").alias("rows_scanned"),
        F.sum("matched").cast("long").alias("rows_matched"),
    ).select(F.lit(layout_name).alias("layout"), "n_blocks", "n_pruned", "rows_scanned", "rows_matched")
