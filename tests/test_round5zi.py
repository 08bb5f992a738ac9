"""Round-5 part-zi twins: the Sequential Dependence Model."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.sdm import (
    LAMBDA_O,
    LAMBDA_T,
    LAMBDA_U,
    UW_WIN,
    sdm_topk,
)


def _idx(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return build_index(docs, text_col="text", id_col="doc_id")


def _py_sdm(texts, t1, t2, mu=2500.0):
    """Pure-Python replica over the analyzer's conventions (lowercase,
    33-word stop filter with position holes preserved)."""
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

    post = []
    for d, t in enumerate(texts):
        raw = [w for w in t.split(" ") if w]
        # positions keep pre-filter indices (stop holes), dl counts
        # surviving tokens — the engine's FieldInvertState convention
        toks = [
            (i, w) for i, w in enumerate(raw) if w not in ENGLISH_STOP_WORDS
        ]
        post.append(toks)
    csize = sum(len(t) for t in post)
    cf = {t1: 0, t2: 0}
    rows = {}
    for d, toks in enumerate(post):
        pos1 = [i for i, w in toks if w == t1]
        pos2 = [i for i, w in toks if w == t2]
        cf[t1] += len(pos1)
        cf[t2] += len(pos2)
        if pos1 or pos2:
            c_o = sum(1 for x in pos1 for y in pos2 if y == x + 1)
            c_u = sum(1 for x in pos1 for y in pos2 if -UW_WIN < y - x < UW_WIN)
            rows[d] = (len(toks), len(pos1), len(pos2), c_o, c_u)
    cfo = sum(v[3] for v in rows.values())
    cfu = sum(v[4] for v in rows.values())

    def feat(c, cfx, dl):
        prior = max(cfx, 0.5) / csize
        return math.log((c + mu * prior) / (dl + mu))

    out = {}
    for d, (dl, tf1, tf2, c_o, c_u) in rows.items():
        s = (
            LAMBDA_T * (feat(tf1, cf[t1], dl) + feat(tf2, cf[t2], dl))
            + LAMBDA_O * feat(c_o, cfo, dl)
            + LAMBDA_U * feat(c_u, cfu, dl)
        )
        out[d] = math.floor(s * 1e4 + 0.5)
    return out


def test_sdm_matches_python_replica(spark):
    texts = [
        "alpha beta gamma delta",          # exact ordered bigram
        "alpha gamma gamma beta pad pad",  # unordered within window
        "beta filler filler filler filler filler filler filler alpha",  # outside uw8
        "alpha only here",
        "nothing relevant at all",
    ]
    got = {
        r["doc_id"]: r["score_q4"]
        for r in sdm_topk(_idx(spark, texts), "alpha", "beta", k=10).collect()
    }
    expect = _py_sdm(texts, "alpha", "beta")
    assert got == expect


def test_sdm_ordered_bigram_outranks_bag_of_words(spark):
    # identical unigram stats; doc 0 has the ordered pair, doc 1 reversed
    texts = [
        "one two pad pad pad pad pad pad pad two one".replace("one two", "q1 q2", 1).replace("two one", "zz yy"),
    ]
    texts = [
        "q1 q2 pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9",
        "q2 pad1 q1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9",
    ]
    rows = sdm_topk(_idx(spark, texts), "q1", "q2", k=2).collect()
    assert [r["doc_id"] for r in rows] == [0, 1]  # ordered-adjacent wins
    assert rows[0]["score_q4"] > rows[1]["score_q4"]


def test_sdm_window_counts_cut_at_uw8(spark):
    # doc 0: distance 7 (inside uw8); doc 1: distance 8 (outside)
    texts = [
        "w1 " + "x " * 6 + "w2 tail tail",
        "w1 " + "x " * 7 + "w2 tail",
    ]
    rows = {r["doc_id"]: r["score_q4"] for r in sdm_topk(_idx(spark, texts), "w1", "w2", k=5).collect()}
    assert rows[0] > rows[1]
