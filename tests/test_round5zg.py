"""Round-5 part-zg twins: TextRank keywords and BM25+."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.textstats import textrank_keywords
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.similarities import bm25_plus_scored


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# --------------------------------------------------------------- TextRank
def _py_textrank(texts, iterations=4, d=0.85):
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

    adj = set()
    for t in texts:
        seq = [w for w in t.split(" ") if w and w not in ENGLISH_STOP_WORDS]
        for a, b in zip(seq, seq[1:]):
            if a != b:
                adj.add((a, b))
                adj.add((b, a))
    vocab = sorted({a for a, _ in adj})
    n = len(vocab)
    deg = {}
    for a, _ in adj:
        deg[a] = deg.get(a, 0) + 1
    pr = {w: 1.0 / n for w in vocab}
    for _ in range(iterations):
        contrib = {w: 0.0 for w in vocab}
        for a, b in adj:
            contrib[b] += pr[a] / deg[a]
        pr = {w: (1.0 - d) * (1.0 / n) + d * contrib[w] for w in vocab}
    return pr


def test_textrank_matches_python_replica(spark):
    texts = [
        "graph rank the word rank graph extraction",
        "word graph rank keyword the extraction pipeline",
    ]
    expect = _py_textrank(texts)
    got = {
        r["word"]: r["rank_q"]
        for r in textrank_keywords(_docs(spark, texts), k=50).collect()
    }
    assert set(got) == set(expect)
    for w, pr in expect.items():
        assert got[w] == math.floor(pr * 1e7 + 0.5), w


def test_textrank_hub_word_ranks_first(spark):
    # 'core' is adjacent to everything; leaves only touch 'core'
    texts = ["core alpha the core beta the core gamma the core delta"]
    rows = textrank_keywords(_docs(spark, texts), k=10).collect()
    assert rows[0]["word"] == "core"
    assert rows[0]["rank_q"] > rows[1]["rank_q"]


# ------------------------------------------------------------------ BM25+
def test_bm25_plus_adds_delta_times_idf(spark):
    texts = ["plus term body", "plus plus other words", "unrelated content here"]
    idx = build_index(_docs(spark, texts), text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    base = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("plus")).collect()}
    plus = {r["doc_id"]: r["score"] for r in bm25_plus_scored(idx, "plus").collect()}
    n, df = 3, 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    for d in base:
        # BM25+ == engine BM25 + delta*idf (engine weight = idf*(k1+1),
        # kernel (k1+1)*tf/(tf+K) identical)
        assert abs(plus[d] - (base[d] + idf)) < 1e-12


def test_bm25_plus_long_doc_lower_bound(spark):
    # one occurrence in a very long doc still scores above delta*idf
    texts = ["bound " + "pad " * 60, "bound here", "none of it"]
    idx = build_index(_docs(spark, texts), text_col="text", id_col="doc_id")
    rows = {r["doc_id"]: r["score"] for r in bm25_plus_scored(idx, "bound").collect()}
    n, df = 3, 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    assert rows[0] > idf  # the delta floor holds even at dl ~61
    assert rows[1] > rows[0]  # shorter doc still preferred
