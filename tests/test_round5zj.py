"""Round-5 part-zj twins: max-passage retrieval and chunk export."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.passages import chunk_export, max_passage_topk


def _idx(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return docs, build_index(docs, text_col="text", id_col="doc_id")


# ------------------------------------------------------------- max passage
def test_max_passage_concentrated_beats_scattered(spark):
    # both docs have tf=3 over 100 tokens; doc 0 concentrates hits in
    # one 50-token passage, doc 1 scatters them across two
    filler = ["f%d" % i for i in range(97)]
    d0 = " ".join(["hit hit hit"] + filler)                       # all in passage 0
    d1 = " ".join(["hit"] + filler[:49] + ["hit"] + filler[49:] + ["hit"])
    _, idx = _idx(spark, [d0, d1])
    rows = max_passage_topk(idx, "hit", k=5, passage_len=50).collect()
    assert rows[0]["doc_id"] == 0
    assert rows[0]["passage_tf"] == 3 and rows[0]["passage_id"] == 0
    assert rows[0]["score_q4"] > rows[1]["score_q4"]


def test_max_passage_hand_computed_score(spark):
    # one doc, 60 tokens: passage 0 has 50 tokens (2 hits), passage 1
    # has 10 tokens (1 hit)
    toks = ["pp", "pp"] + [f"x{i}" for i in range(48)] + ["pp"] + [f"y{i}" for i in range(9)]
    _, idx = _idx(spark, [" ".join(toks), "other doc entirely"])
    rows = {r["passage_id"]: r for r in max_passage_topk(idx, "pp", k=5).collect()}
    n, df = 2, 1
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def sc(tf, plen):
        return math.floor(idf * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * plen / 50.0)) * 1e4 + 0.5)
    # winner is whichever passage scores higher; both belong to doc 0
    best = rows[list(rows)[0]]
    assert best["score_q4"] == max(sc(2, 50), sc(1, 10))


def test_max_passage_tie_breaks_lower_passage_id(spark):
    # two identical passages: the earlier one must win
    half = ["tie"] + [f"a{i}" for i in range(49)]
    _, idx = _idx(spark, [" ".join(half + half)])
    row = max_passage_topk(idx, "tie", k=1).collect()[0]
    assert row["passage_id"] == 0


# ------------------------------------------------------------ chunk export
def test_chunk_export_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    rows = {r["chunk_id"]: r for r in chunk_export(docs, size=64, stride=48).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["chunk"].split(" ") == words[0:64]
    assert rows[1]["chunk"].split(" ") == words[48:100]  # truncated at end
    assert rows[2]["chunk"].split(" ") == words[96:100]
    assert rows[1]["n_tokens"] == 52 and rows[2]["n_tokens"] == 4
    # overlap: last 16 of chunk 0 == first 16 of chunk 1
    assert rows[0]["chunk"].split(" ")[-16:] == rows[1]["chunk"].split(" ")[:16]


def test_chunk_export_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(0, "just a few tokens")], "doc_id long, text string")
    rows = chunk_export(docs, size=64, stride=48).collect()
    assert len(rows) == 1
    assert rows[0]["chunk"] == "just a few tokens"
    assert rows[0]["n_tokens"] == 4


def test_chunk_export_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_export(docs, size=32, stride=40)
