"""SmallFloat-315 quantization parity (reference Util/SmallFloat.cs and the
reference's TestSmallFloat invariants)."""

import numpy as np

from lucenenet_spark.index.smallfloat import (
    bm25_norm_cache,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
    norm_table,
)


def test_documented_extremes():
    # SmallFloat.cs doc comments: smallest non-zero = 5.820766E-10,
    # largest = 7.5161928E9, epsilon = 0.125
    assert byte315_to_float(np.uint8(1)) == np.float32(5.820766e-10)
    assert byte315_to_float(np.uint8(255)) == np.float32(7.5161928e9)
    assert byte315_to_float(np.uint8(0)) == 0.0


def test_zero_and_negative_map_to_zero():
    assert float_to_byte315(np.float32(0.0)) == 0
    assert float_to_byte315(np.float32(-1.0)) == 0
    # tiny positive underflows to 1
    assert float_to_byte315(np.float32(1e-12)) == 1


def test_roundtrip_monotonic():
    bytes_in = np.arange(256, dtype=np.uint8)
    floats = byte315_to_float(bytes_in)
    # decode is strictly increasing over 1..255
    assert np.all(np.diff(floats[1:]) > 0)
    # encode(decode(b)) == b for representable values
    back = float_to_byte315(floats[1:])
    assert np.array_equal(back, bytes_in[1:])


def test_encode_norm_known_values():
    # norm(1 token) = byte315(1/sqrt(1)) = byte315(1.0)
    b1 = encode_norm(np.array([1]))[0]
    assert byte315_to_float(np.uint8(b1)) == np.float32(1.0)
    # decode table: 1/f^2 recovers an approximation of the length
    tbl = norm_table()
    approx_len = float(tbl[b1])
    assert abs(approx_len - 1.0) < 1e-6
    # longer docs -> smaller norm byte value decodes to larger 1/f^2
    b100 = encode_norm(np.array([100]))[0]
    assert tbl[b100] > tbl[b1]


def test_norm_table_zero_is_inf():
    tbl = norm_table()
    assert np.isinf(tbl[0])


def test_bm25_cache_formula():
    cache = bm25_norm_cache(avgdl=10.0, k1=1.2, b=0.75)
    tbl = norm_table()
    i = 150
    expected = np.float32(1.2) * (
        np.float32(1.0) - np.float32(0.75) + np.float32(0.75) * tbl[i] / np.float32(10.0)
    )
    assert cache[i] == expected
    assert np.isinf(cache[0])  # missing/zero-length doc -> infinite norm -> score 0
