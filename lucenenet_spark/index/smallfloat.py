"""SmallFloat 3-mantissa-bit / zeroExp-15 byte encoding of norms.

Exact reimplementation of the reference's norm quantization
(src/Lucene.Net/Util/SmallFloat.cs:146-199, SingleToSByte315 /
SByte315ToSingle) using numpy bit-twiddling so batches encode vectorized.

BM25 stores ``byte315(boost / sqrt(fieldLength))`` per doc
(src/Lucene.Net/Search/Similarities/BM25Similarity.cs EncodeNormValue) and
decodes via a 256-entry table ``1/f(b)^2``  (LoadNormTable). Score parity
requires bit-exact bytes, so everything here follows the C# int paths.
"""

from __future__ import annotations

import numpy as np

_FZERO = (63 - 15) << 3  # 384


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Vectorized SmallFloat.SingleToSByte315 (SmallFloat.cs:146-161),
    returned as uint8."""
    arr = np.asarray(f, dtype=np.float32)
    bits = arr.view(np.int32) if arr.shape else np.array([arr], dtype=np.float32).view(np.int32)
    scalar = arr.shape == ()
    if scalar:
        arr = arr.reshape(1)
        bits = arr.view(np.int32)
    smallfloat = bits >> (24 - 3)
    out = np.empty(arr.shape, dtype=np.uint8)
    lo = smallfloat <= _FZERO
    hi = smallfloat >= _FZERO + 0x100
    mid = ~(lo | hi)
    out[lo] = np.where(bits[lo] <= 0, 0, 1)
    out[hi] = 0xFF
    out[mid] = (smallfloat[mid] - _FZERO).astype(np.uint8)
    return out[0] if scalar else out


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Vectorized SmallFloat.SByte315ToSingle (SmallFloat.cs:180-199)."""
    arr = np.atleast_1d(np.asarray(b, dtype=np.uint8))
    bits = (arr.astype(np.int32) << (24 - 3)) + ((63 - 15) << 24)
    out = bits.view(np.float32).copy()
    out[arr == 0] = 0.0
    return out if np.asarray(b).shape else out[0]


def encode_norm(field_length: np.ndarray, boost: float = 1.0) -> np.ndarray:
    """BM25Similarity.EncodeNormValue: byte315(boost / sqrt(length)).

    The division happens in float32, as in C#
    (BM25Similarity.cs EncodeNormValue: `boost / (float)Math.Sqrt(len)`;
    Math.Sqrt is double, the quotient is float).
    """
    fl = np.asarray(field_length, dtype=np.float64)
    with np.errstate(divide="ignore"):
        # C# order matters: Math.Sqrt is double, cast to float FIRST, then
        # the division runs float32/float32. Dividing in float64 and
        # rounding once can differ by 1 ulp, which float_to_byte315's
        # truncation can turn into a different stored byte.
        val = (np.float32(boost) / np.sqrt(fl).astype(np.float32)).astype(np.float32)
    return float_to_byte315(val)


def norm_table() -> np.ndarray:
    """BM25Similarity.LoadNormTable: NORM_TABLE[i] = 1f / f(i)^2 (float32).
    NORM_TABLE[0] is +inf (1/0), matching C# float division semantics."""
    f = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)
    with np.errstate(divide="ignore"):
        return (np.float32(1.0) / (f * f)).astype(np.float32)


def bm25_norm_cache(avgdl: float, k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    """BM25Similarity.ComputeWeight cache:
    cache[i] = k1 * ((1 - b) + b * NORM_TABLE[i] / avgdl), all float32 ops."""
    k1f, bf, avg = np.float32(k1), np.float32(b), np.float32(avgdl)
    table = norm_table()
    return (k1f * ((np.float32(1.0) - bf) + bf * table / avg)).astype(np.float32)
