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
