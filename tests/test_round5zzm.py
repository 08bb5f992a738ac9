"""Round-5 part-zzm twins: unigram entropy and term burstiness."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from lucenenet_spark.functions.textstats import term_burstiness, unigram_entropy
from lucenenet_spark.index.builder import build_index


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def _entropy_q9_sum(tokens):
    L = len(tokens)
    out = 0
    for c in Counter(tokens).values():
        f = c / L
        out += math.floor(-f * math.log(f) * 1e9 + 0.5)
    return out


def test_entropy_replica(spark):
    texts = [
        "aa aa aa aa",          # zero entropy
        "aa bb cc dd",          # maximal for dl=4
        "aa aa bb cc",
        "aa bb aa bb cc cc dd",
    ]
    idx = _index(spark, texts)
    rows = {r["doc_id"]: r for r in unigram_entropy(idx).collect()}
    for d, t in enumerate(texts):
        toks = t.split()
        assert rows[d]["dl"] == len(toks)
        assert rows[d]["n_distinct"] == len(set(toks))
        assert rows[d]["entropy_q9_sum"] == _entropy_q9_sum(toks)
    assert rows[0]["entropy_q9_sum"] == 0
    assert rows[1]["entropy_q9_sum"] == 4 * math.floor(0.25 * math.log(4) * 1e9 + 0.5)


def test_entropy_uniform_beats_skewed(spark):
    texts = ["aa bb cc dd ee ff", "aa aa aa aa aa ff"]
    idx = _index(spark, texts)
    rows = {r["doc_id"]: r["entropy_q9_sum"] for r in unigram_entropy(idx).collect()}
    assert rows[0] > rows[1]


def test_burstiness_replica(spark):
    # 'bursty' occurs 4x in one doc; 'flat' once in each of 4 docs
    texts = ["bursty bursty bursty bursty", "flat x", "flat y", "flat z", "flat w"]
    idx = _index(spark, texts)
    rows = {r["term"]: r for r in term_burstiness(idx, min_df=1).collect()}
    assert rows["bursty"]["burst_q6"] == 4_000_000  # 4/1
    assert rows["flat"]["burst_q6"] == 1_000_000    # 4/4
    assert rows["bursty"]["df"] == 1 and rows["bursty"]["ttf"] == 4


def test_burstiness_min_df_filter(spark):
    texts = ["rare q", "common common r", "common s"]
    idx = _index(spark, texts)
    terms = {r["term"] for r in term_burstiness(idx, min_df=2).collect()}
    assert "common" in terms and "rare" not in terms
    with pytest.raises(ValueError):
        term_burstiness(idx, min_df=0)
