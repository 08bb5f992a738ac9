"""Sequence packing: concat-and-chunk documents into fixed-size
training sequences.

LLM pretraining pipelines concatenate the tokenized corpus into one
stream and cut it into fixed ``budget``-token training sequences (the
GPT-style "concat and chunk" packing; documents may straddle sequence
boundaries). The per-document artifact is its global token offset and
the first/last sequence ids it lands in — enough to materialize any
sequence, attribute a training sequence back to its source documents,
or audit a decontamination pass at sequence granularity.

Scale design (100 TB): the global offset is an exclusive prefix sum over
the corpus in a deterministic order. A single unpartitioned window would
serialize the corpus through one task, so this runs the classic
distributed two-phase scan instead: range-partition by the order key
(persisted — range boundaries are sampled per job, see
index/builder.assign_doc_ids), per-partition cumulative sums in a
window PARTITIONED by the range bucket (parallel), and a driver-side
cumulative offset over the per-partition totals (one row per partition,
bounded by the partition count, joined back via broadcast). No stage
touches more than one partition's rows at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_counts_col(text_col: str = "text"):
    """Whitespace token count as a Column (empty tokens dropped)."""
    return F.size(F.array_remove(F.split(F.col(text_col), " "), ""))


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    num_partitions: int = 16,
) -> DataFrame:
    """(id, n_tokens, offset, seq_first, seq_last): concat-and-chunk
    packing of the corpus (ordered by ``id_col``) into ``budget``-token
    sequences.

    ``offset`` is the document's position in the global token stream
    (exclusive prefix sum); ``seq_first``/``seq_last`` are the first and
    last sequence ids the document occupies. Zero-token documents are
    pinned to the sequence at their offset (they occupy no tokens but
    still map somewhere deterministic).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = F.col(tokens_col) if tokens_col else token_counts_col(text_col)
    d = df.select(F.col(id_col).alias("_id"), n.cast("long").alias("n_tokens"))
    # phase 1: range-partition on the order key; persist so the sampled
    # range boundaries are identical across the two jobs below
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
        # partition; RangePartitioner indexes are ascending in key order)
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
        # materialize before unpersisting the phase-1 frame
        return out.localCheckpoint(eager=True)
    finally:
        d.unpersist()


def sequence_fill_stats(packed: DataFrame, budget: int) -> DataFrame:
    """(n_sequences, total_tokens, last_fill): how many training
    sequences the packing produced and how full the final one is —
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
