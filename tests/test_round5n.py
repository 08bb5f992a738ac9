"""Round-5n tests: temperature mixture weights and sequence packing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.packing import pack_sequences
from lucenenet_spark.functions.sampling import temperature_weights

ROWS = [
    # (doc_id, text, lang) — lang counts: en 4, de 2, th 1
    (0, "a b c", "en"),
    (1, "d e f g h", "en"),
    (2, "i", "en"),
    (3, "j k", "en"),
    (4, "l m n o", "de"),
    (5, "p q r", "de"),
    (6, "s t u v w x", "th"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text", "lang"])


# ------------------------------------------------------------ temperature
def test_temperature_alpha_one_is_proportional(docs):
    out = {r.lang: r for r in temperature_weights(docs, "lang", alpha=1.0).collect()}
    for r in out.values():
        assert r.repeat_factor == pytest.approx(1.0)
    assert out["en"].p == pytest.approx(4 / 7)


def test_temperature_alpha_zero_is_uniform(docs):
    out = {r.lang: r.p for r in temperature_weights(docs, "lang", alpha=0.0).collect()}
    assert all(p == pytest.approx(1 / 3) for p in out.values())


def test_temperature_half_brute_force(docs):
    out = {r.lang: r for r in temperature_weights(docs, "lang", alpha=0.5).collect()}
    z = math.sqrt(4) + math.sqrt(2) + math.sqrt(1)
    assert out["th"].p == pytest.approx(1 / z)
    # tail upsampled, head downsampled
    assert out["th"].repeat_factor > 1.0 > out["en"].repeat_factor


def test_temperature_rejects_bad_alpha(docs):
    with pytest.raises(ValueError):
        temperature_weights(docs, "lang", alpha=1.5)


# ------------------------------------------------------------ packing
def _brute_pack(rows, capacity, n_shards):
    out = {}
    streams = {}
    for doc_id, text, _lang in sorted(rows):
        n = len(text.split(" "))
        if n == 0:
            continue
        shard = doc_id % n_shards
        off = streams.get(shard, 0)
        streams[shard] = off + n
        first, last = off // capacity, (off + n - 1) // capacity
        out[doc_id] = (shard, n, off, first, last, last - first + 1)
    return out


def test_pack_sequences_brute_force(docs):
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.offset, r.chunk_first, r.chunk_last, r.chunks_spanned)
        for r in pack_sequences(docs, capacity=4, n_shards=2).collect()
    }
    assert got == _brute_pack(ROWS, 4, 2)


def test_pack_sequences_partitioning_invariance(docs):
    a = sorted(map(tuple, pack_sequences(docs, capacity=4, n_shards=2).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(5), capacity=4, n_shards=2).collect())
    )
    assert a == b


def test_pack_sequences_chunk_laws(spark, docs):
    out = pack_sequences(docs, capacity=3, n_shards=1).collect()
    # stream is contiguous: offsets sorted by doc_id tile the token stream
    rows = sorted(out, key=lambda r: r.doc_id)
    expect = 0
    for r in rows:
        assert r.offset == expect
        expect += r.n_tokens
        assert r.chunks_spanned == r.chunk_last - r.chunk_first + 1
        assert r.chunk_first == r.offset // 3


def test_pack_sequences_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=4, n_shards=0)
