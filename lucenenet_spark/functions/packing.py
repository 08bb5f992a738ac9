"""Sequence packing for LLM pretraining batches.

The standard pretraining data layout concatenates documents (with an
implicit separator) and slices the stream into fixed-capacity context
windows ("concat-then-chunk" packing, the GPT/LLaMA convention). The
useful per-doc bookkeeping is WHERE each document lands: its token
offset in the packed stream and the first/last chunk it touches —
that's what sequence-boundary masking and provenance tracking consume.

Distribution: a single global stream would serialize on one reducer, so
the stream is SHARDED — docs are assigned to `n_shards` independent
streams by `doc_id % n_shards` and packed per shard in doc-id order.
Each shard's offsets are a window cumulative sum (one shuffle on the
shard key, sort within shard). At 100 TB you size n_shards to the
cluster's reducer count (thousands), so no reducer sees more than
|corpus| / n_shards tokens; determinism is preserved because both the
shard assignment and the within-shard order are pure functions of the
doc id, not of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "pack_stream_offsets", "sequence_fill_stats"]


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc packing coordinates under concat-then-chunk.

    Returns (doc_id, shard, n_tokens, offset, chunk_first, chunk_last,
    chunks_spanned): `offset` is the doc's starting token index in its
    shard's packed stream; a doc occupies chunks
    floor(offset/capacity) .. floor((offset+n_tokens-1)/capacity).
    Tokens are raw whitespace tokens (the budget unit is the trainer's
    tokenizer; whitespace is the deterministic stand-in used across this
    repo's token-count ops)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    n_tok = F.size(F.split(F.col(text_col), " "))
    base = docs.select(
        id_col,
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy(id_col)
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("offset")
    out = base.select(id_col, "shard", "n_tokens", offset)
    chunk_first = F.floor(F.col("offset") / capacity)
    chunk_last = F.floor((F.col("offset") + F.col("n_tokens") - 1) / capacity)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "offset",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).alias("chunks_spanned"),
    )


# --------------------------------------------------------------------------
# Single GLOBAL packed stream (the complement of the sharded layout above):
# when the training job needs ONE corpus-order stream — e.g. to reproduce a
# published run's exact chunk boundaries or audit decontamination at
# sequence granularity — the offset is a global exclusive prefix sum. A
# serial window would bottleneck, so this runs the classic distributed
# two-phase scan: range-partition by the order key (persisted — range
# boundaries are sampled per job, see index/builder.assign_doc_ids),
# per-partition cumsums in a window PARTITIONED by the range bucket, and a
# driver-side cumulative offset over per-partition totals (one row per
# partition, joined back via broadcast).
# --------------------------------------------------------------------------


def pack_stream_offsets(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    num_partitions: int = 16,
) -> DataFrame:
    """(id, n_tokens, offset, seq_first, seq_last): global concat-and-chunk
    packing into ``budget``-token sequences, ordered by ``id_col``.

    ``offset`` is the document's position in the single global token
    stream; ``seq_first``/``seq_last`` the first and last sequence ids it
    occupies. Zero-token documents pin to the sequence at their offset.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = F.col(tokens_col) if tokens_col else F.size(
        F.array_remove(F.split(F.col(text_col), " "), "")
    )
    d = df.select(F.col(id_col).alias("_id"), n.cast("long").alias("n_tokens"))
    # phase 1: range-partition on the order key; persist pins the sampled
    # range boundaries across the two jobs below
    d = d.repartitionByRange(num_partitions, "_id").persist()
    try:
        d = d.withColumn("_pid", F.spark_partition_id())
        local = d.withColumn(
            "_local_cum",
            F.sum("n_tokens").over(
                Window.partitionBy("_pid")
                .orderBy("_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        # phase 2: per-partition totals -> exclusive offsets (one row per
        # partition; RangePartitioner indexes ascend in key order)
        totals = sorted(
            d.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect(),
            key=lambda r: r["_pid"],
        )
        offsets, acc = [], 0
        for r in totals:
            offsets.append((r["_pid"], acc))
            acc += r["t"]
        off_df = d.sparkSession.createDataFrame(
            offsets or [(0, 0)], "_pid int, _part_off long"
        )
        out = (
            local.join(F.broadcast(off_df), "_pid")
            .select(
                F.col("_id").alias(id_col),
                "n_tokens",
                (F.col("_part_off") + F.col("_local_cum") - F.col("n_tokens")).alias(
                    "offset"
                ),
            )
            .withColumn("seq_first", F.floor(F.col("offset") / budget).cast("long"))
            .withColumn(
                "seq_last",
                F.floor(
                    (F.col("offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                    / budget
                ).cast("long"),
            )
        )
        # materialize before releasing the pinned phase-1 frame
        return out.localCheckpoint(eager=True)
    finally:
        d.unpersist()


def sequence_fill_stats(packed: DataFrame, budget: int) -> DataFrame:
    """(n_sequences, total_tokens, last_fill): how many training
    sequences the global packing produced and how full the final one is —
    the packing audit row."""
    return packed.agg(
        (F.floor((F.max(F.col("offset") + F.col("n_tokens")) - 1) / budget) + 1)
        .cast("long")
        .alias("n_sequences"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (
            ((F.max(F.col("offset") + F.col("n_tokens")) - 1) % budget) + 1
        ).cast("long").alias("last_fill"),
    )


def fim_split_export(
    docs: DataFrame, min_chars: int = 30, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fill-in-the-middle split export (Bavarian et al., "Efficient
    Training of Language Models to Fill in the Middle", 2022): each
    document is cut into (prefix, middle, suffix) for the FIM training
    objective.  Cut points are DETERMINISTIC character thirds (p1 =
    len//3, p2 = 2*len//3) rather than sampled — the repo-wide rule
    that randomness lives in a seeded, oracle-reproducible transform.

    Output per surviving doc (len >= min_chars): (doc_id, n_chars,
    p1, p2, prefix_md5, middle_md5, suffix_md5) — md5s so the gate
    hash-compares without shipping text.  Pure Column slicing, no UDF;
    the PSM re-assembly is concat(prefix, suffix, middle) downstream.
    """
    if min_chars < 3:
        raise ValueError("min_chars must be >= 3 so every part is non-empty")
    t = F.col(text_col)
    n = F.length(t)
    p1 = (n / 3).cast("long")
    p2 = (n * 2 / 3).cast("long")
    out = docs.filter(n >= min_chars).select(
        F.col(id_col).alias("doc_id"),
        n.cast("long").alias("n_chars"),
        p1.alias("p1"),
        p2.alias("p2"),
        F.md5(t.substr(F.lit(1), p1)).alias("prefix_md5"),
        F.md5(t.substr(p1 + 1, p2 - p1)).alias("middle_md5"),
        F.md5(t.substr(p2 + 1, n - p2)).alias("suffix_md5"),
    )
    return out


def seq_length_histogram(index, field: str | None = None) -> DataFrame:
    """Token-length histogram in power-of-two buckets — the packing /
    context-window planning table (how much of the corpus fits 512?
    how much needs 4k?).  bucket = 2^ceil(log2(dl)); the float log2 is
    engine-safe here because log2(n) for a non-power-of-two integer n
    sits at least ~1/(n ln 2) away from an integer (>> one ulp for any
    realistic dl), and exact powers of two are exactly representable —
    so ceil agrees bit-for-bit across engines.  Output rows are exact
    integers: (bucket, n_docs, total_tokens).
    """
    fld = field or index.default_field
    dl = index.postings.filter(F.col("field") == fld).groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    bucket = F.when(F.col("dl") <= 1, F.lit(1).cast("long")).otherwise(
        F.pow(F.lit(2.0), F.ceil(F.log2(F.col("dl").cast("double"))))
        .cast("long")
    )
    return dl.select(bucket.alias("bucket"), "dl").groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
