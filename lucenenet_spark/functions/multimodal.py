"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque `binary` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling are Arrow-batched
mapInPandas stages. The actual media codecs are NOT available in this
environment, so the decode kernel is stubbed: `decoder="fake"` produces a
deterministic feature vector from the bytes (so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is fully real and tested),
and `decoder="pillow"`-style real backends raise NotImplementedError until
the library is present (import-gated).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_batch(payloads: pd.Series, dim: int) -> list[list[float] | None]:
    """Deterministic stand-in for image decode + embed: sha256 of the bytes
    expanded to `dim` floats in [0, 1). Stable across runs/engines."""
    out: list[list[float] | None] = []
    for b in payloads:
        if b is None:
            out.append(None)
            continue
        h = hashlib.sha256(bytes(b)).digest()
        reps = (dim * 4 + len(h) - 1) // len(h)
        raw = (h * reps)[: dim * 4]
        vec = np.frombuffer(raw, dtype=np.uint32).astype(np.float64) / 2**32
        out.append(vec.astype(np.float32).tolist())
    return out


def extract_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, n_bytes, feature[dim]) via Arrow-batched decode.

    decoder="fake": deterministic hash features (see module docstring).
    decoder="pillow": real image decode — unavailable in this container.
    """
    if decoder != "fake":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"decoder={decoder!r} needs an image library not present in "
                "this environment; use decoder='fake' for plumbing tests"
            ) from e
        raise NotImplementedError("real decoders land when the container has codecs")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf[payload_col].map(lambda b: 0 if b is None else len(b)).astype(
                        "int32"
                    ),
                    "feature": _fake_decode_batch(pdf[payload_col], dim),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """Frame-sampling plumbing: emit up to max_frames byte-slices per media
    row (one output row per 'frame') — the explode shape a real video
    pipeline needs, with a byte-slicing stand-in for the codec."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf[payload_col]):
                if b is None:
                    continue
                b = bytes(b)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return media.mapInPandas(run, schema)


def media_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed-metadata aggregation over the binary column (pure Column ops):
    per-mime count/bytes — the partition-pruning dimension for media tables."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length(F.col(payload_col))).alias("total_bytes"),
    )


# --------------------------------------------------------------------------
# Perceptual hashing (pHash-style DCT fingerprint) over the opaque binary
# payload column — the media-side near-duplicate family member beside
# MinHash (text sets) / SimHash (term profiles) / winnowing (substrings).
# --------------------------------------------------------------------------

_DCT_N = 8
_DCT_SCALE = 1000


def dct_table() -> list[tuple[int, int, int]]:
    """Quantized 8x8 DCT-II basis: rows (u, x, w) with
    w = round(cos(pi*(2x+1)*u/16) * 1000) — integer literals shared
    verbatim with the SQL oracle (the ann_lsh plane-literal pattern).
    Normalization (alpha) factors are deliberately omitted: the hash
    thresholds each coefficient against the pool median, and dropping
    the per-row scale keeps every coefficient an exact integer."""
    import math as _m

    return [
        (u, x, int(round(_m.cos(_m.pi * (2 * x + 1) * u / (2 * _DCT_N)) * _DCT_SCALE)))
        for u in range(_DCT_N)
        for x in range(_DCT_N)
    ]


def perceptual_hash(media: DataFrame, payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """63-bit pHash-style fingerprint per payload (Zauner, "Implementation
    and Benchmarking of Perceptual Image Hash Functions", 2010 — the
    classic DCT hash: low-frequency block thresholded at its median).

    The decode stage is the repo's honest multimodal stand-in: the
    "image" is the 64-nibble sha256 hex of the payload arranged as an
    8x8 grid (identical bytes -> identical grid, near-identical bytes ->
    unrelated grid, exactly like extract_features' fake decoder).  The
    2-D DCT uses the quantized integer basis (dct_table), each of the
    63 non-DC coefficients is an exact integer, the threshold is the
    nearest-rank lower median (32nd smallest of 63), and the fingerprint
    packs bit (u,v) at position u*8+v-1 — 63 bits, BIGINT-safe.

    Fully JVM-side: sha2 + explode + one broadcast join against the
    64-row basis + two aggregations; no Python workers.
    """
    spark = media.sparkSession
    tdf = F.broadcast(
        spark.createDataFrame(dct_table(), "u int, x int, w long")
    )
    pix = (
        media.select(
            F.col(id_col),
            F.sha2(F.col(payload_col), 256).alias("hx"),
        )
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.split(F.col("hx"), ""),
                    lambda c: F.conv(c, 16, 10).cast("long"),
                )
            ).alias("i", "p"),
        )
        .filter(F.col("i") < 64)
        .select(
            id_col,
            (F.col("i") / 8).cast("int").alias("x"),
            (F.col("i") % 8).cast("int").alias("y"),
            "p",
        )
    )
    tu = tdf.select(F.col("u"), F.col("x"), F.col("w").alias("wu"))
    tv = tdf.select(F.col("u").alias("v"), F.col("x").alias("y"), F.col("w").alias("wv"))
    coefs = (
        pix.join(tu, "x")
        .join(tv, "y")
        .groupBy(id_col, "u", "v")
        .agg(F.sum(F.col("p") * F.col("wu") * F.col("wv")).cast("long").alias("c"))
        .filter(~((F.col("u") == 0) & (F.col("v") == 0)))
    )
    from pyspark.sql import Window

    med = (
        coefs.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.asc("c"), F.asc("u"), F.asc("v"))
            ),
        )
        .filter(F.col("r") == 32)
        .select(id_col, F.col("c").alias("med"))
    )
    return (
        coefs.join(med, id_col)
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("c") > F.col("med"),
                    # dynamic bit position: pow(2, k) is exact in double
                    # for k <= 62 (the F.shiftleft numBits-must-be-static
                    # gotcha)
                    F.expr("CAST(pow(2, u * 8 + v - 1) AS BIGINT)"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("phash")
        )
    )


def phash_near_dup_pairs(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    top_n: int = 20,
) -> DataFrame:
    """Top-N closest payload pairs by pHash Hamming distance
    (distance asc, ids asc).  Exact all-pairs at audit scale; the
    production path band-buckets hash prefixes exactly like the MinHash
    LSH discipline (16-bit bands -> join only bucket collisions).
    """
    fp = perceptual_hash(media, payload_col, id_col)
    a = fp.select(F.col(id_col).alias("doc_a"), F.col("phash").alias("fa"))
    b = fp.select(F.col(id_col).alias("doc_b"), F.col("phash").alias("fb"))
    return (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(fa ^ fb)").cast("long").alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(top_n)
    )
