"""Round-5 part-zzt twins: FIM splits and sequence-length histogram."""

from __future__ import annotations

import hashlib

import pytest

from lucenenet_spark.functions.packing import fim_split_export, seq_length_histogram
from lucenenet_spark.index.builder import build_index


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_fim_replica(spark):
    texts = ["a" * 10 + "b" * 10 + "c" * 13, "x" * 99, "tooshort"]
    rows = {r["doc_id"]: r for r in fim_split_export(_docs(spark, texts), min_chars=30).collect()}
    assert set(rows) == {0, 1}  # doc 2 filtered
    for d in (0, 1):
        t = texts[d]
        n = len(t)
        p1, p2 = n // 3, n * 2 // 3
        r = rows[d]
        assert (r["n_chars"], r["p1"], r["p2"]) == (n, p1, p2)
        assert r["prefix_md5"] == _md5(t[:p1])
        assert r["middle_md5"] == _md5(t[p1:p2])
        assert r["suffix_md5"] == _md5(t[p2:])


def test_fim_parts_reassemble(spark):
    # the three parts partition the doc: lengths sum to n_chars
    texts = ["q" * 31, "r" * 47]
    for r in fim_split_export(_docs(spark, texts), min_chars=30).collect():
        assert 0 < r["p1"] < r["p2"] < r["n_chars"]


def test_fim_validation(spark):
    with pytest.raises(ValueError):
        fim_split_export(_docs(spark, ["abc"]), min_chars=2)


def test_histogram_replica(spark):
    # token lengths: 1, 2, 3, 5, 8, 16 -> buckets 1, 2, 4, 8, 8, 16
    texts = [
        "t1", "t1 t2", "t1 t2 t3", "t1 t2 t3 t4 t5",
        " ".join(f"w{i}" for i in range(8)),
        " ".join(f"v{i}" for i in range(16)),
    ]
    idx = build_index(_docs(spark, texts), text_col="text", id_col="doc_id")
    rows = {r["bucket"]: r for r in seq_length_histogram(idx).collect()}
    assert rows[1]["n_docs"] == 1 and rows[1]["total_tokens"] == 1
    assert rows[2]["n_docs"] == 1 and rows[2]["total_tokens"] == 2
    assert rows[4]["n_docs"] == 1 and rows[4]["total_tokens"] == 3
    assert rows[8]["n_docs"] == 2 and rows[8]["total_tokens"] == 13
    assert rows[16]["n_docs"] == 1 and rows[16]["total_tokens"] == 16
    assert set(rows) == {1, 2, 4, 8, 16}


def test_histogram_power_of_two_lands_in_own_bucket(spark):
    texts = [" ".join(f"u{i}" for i in range(4))]  # exactly 4 tokens
    idx = build_index(_docs(spark, texts), text_col="text", id_col="doc_id")
    rows = seq_length_histogram(idx).collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 4
