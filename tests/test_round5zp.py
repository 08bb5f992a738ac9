"""Round-5 part-zp twins: MaxScore pruning and the next-word index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.index.nextword import build_nextword_index, nextword_phrase_topk
from lucenenet_spark.search.accumulators import maxscore_topk
from lucenenet_spark.search.queries import BooleanQuery, Occur, PhraseQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


CORPUS = [
    "rare gem stone",
    "rare gem",
    "common words common filler",
    "common filler words",
    "common gem filler",
    "words filler pad",
    "gem gem common",
    "pad pad rare",
]


# ----------------------------------------------------------------- maxscore
def _or_topk_quantized(searcher, terms, k):
    """Reference: full OR over per-term quantized contributions."""
    parts = None
    for t in terms:
        c = searcher.scored(TermQuery(t)).select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("c_q"),
        )
        parts = c if parts is None else parts.unionByName(c)
    rows = (
        parts.groupBy("doc_id")
        .agg(F.sum("c_q").cast("long").alias("score_q"))
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    return [(r["doc_id"], r["score_q"]) for r in rows]


def test_maxscore_identical_to_full_or(spark):
    _, s = _engine(spark, CORPUS)
    terms = ["rare", "common", "filler"]
    got = maxscore_topk(s, terms, k=3).collect()
    want = _or_topk_quantized(s, terms, 3)
    assert [(r["doc_id"], r["score_q"]) for r in got] == want
    assert all(r["n_terms"] == 3 for r in got)
    assert 1 <= got[0]["n_essential"] <= 3


def test_maxscore_k_larger_than_matches(spark):
    _, s = _engine(spark, CORPUS)
    got = maxscore_topk(s, ["rare"], k=50).collect()
    # theta=0 (no kth doc) -> every term essential, plain ranking
    assert {r["doc_id"] for r in got} == {0, 1, 7}
    assert all(r["n_essential"] == 1 for r in got)


def test_maxscore_prunes_when_rare_term_dominates(spark):
    # one very rare high-impact term + one ubiquitous weak term with
    # k=1: theta = top 'rare' score; the weak term's max impact alone
    # stays below it -> n_essential < n_terms, result still exact
    texts = ["rare rare rare rare x"] + ["x pad%d filler other words more" % i for i in range(9)]
    _, s = _engine(spark, texts)
    got = maxscore_topk(s, ["rare", "x"], k=1).collect()
    want = _or_topk_quantized(s, ["rare", "x"], 1)
    assert [(r["doc_id"], r["score_q"]) for r in got] == want
    assert got[0]["n_essential"] == 1  # 'x' pruned from candidate generation


def test_maxscore_validates_inputs(spark):
    _, s = _engine(spark, CORPUS)
    with pytest.raises(ValueError):
        maxscore_topk(s, [])
    with pytest.raises(ValueError):
        maxscore_topk(s, ["x"], k=0)


# ----------------------------------------------------------------- nextword
def test_nextword_matches_phrase_query(spark):
    texts = [
        "alpha beta gamma",
        "alpha beta alpha beta",
        "beta alpha",
        "gamma alpha beta delta",
        "alpha gamma beta",   # NOT adjacent
    ]
    idx, s = _engine(spark, texts)
    nw = build_nextword_index(idx)
    got = nextword_phrase_topk(idx, nw, "alpha", "beta", k=10).collect()
    want = (
        s.scored(PhraseQuery(("alpha", "beta")))
        .select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .collect()
    )
    assert [(r["doc_id"], r["score_q"]) for r in got] == [
        (r["doc_id"], r["score_q"]) for r in want
    ]
    tfs = {r["doc_id"]: r["pair_tf"] for r in got}
    assert tfs == {0: 1, 1: 2, 3: 1}


def test_nextword_stop_word_hole_blocks_adjacency(spark):
    # 'alpha the beta': 'the' is a stop word but leaves a position hole,
    # so (alpha, beta) is NOT adjacent — same as ExactPhraseScorer
    idx, s = _engine(spark, ["alpha the beta", "alpha beta"])
    nw = build_nextword_index(idx)
    rows = nextword_phrase_topk(idx, nw, "alpha", "beta", k=10).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_nextword_firstwords_partial_index(spark):
    idx, _ = _engine(spark, ["alpha beta gamma delta", "beta gamma"])
    nw_full = build_nextword_index(idx)
    nw_part = build_nextword_index(idx, firstwords=["alpha"])
    assert nw_part.filter(F.col("w1") != "alpha").count() == 0
    # the alpha rows agree between full and partial builds
    a = {tuple(r) for r in nw_full.filter(F.col("w1") == "alpha").collect()}
    b = {tuple(r) for r in nw_part.collect()}
    assert a == b


def test_nextword_validates_k(spark):
    idx, _ = _engine(spark, ["a b"])
    nw = build_nextword_index(idx)
    with pytest.raises(ValueError):
        nextword_phrase_topk(idx, nw, "a", "b", k=0)
