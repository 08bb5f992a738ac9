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

__all__ = ["pack_sequences"]


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
