"""Round-5 part-zh twins: alpha-DCG and intent-aware precision."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import alpha_dcg_at_k, intent_aware_precision
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _corpus(spark, rows):
    """rows: (doc_id, text, lang)"""
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, IndexSearcher(idx, mode="double")


def test_alpha_dcg_hand_computed(spark):
    # tf descending by doc_id so the BM25 ranking is doc 0,1,2,3 with
    # aspects en,en,fr,en -> novelty c = 0,1,0,2
    docs, s = _corpus(
        spark,
        [
            (0, "div div div div x", "en"),
            (1, "div div div y z", "en"),
            (2, "div div p q r", "fr"),
            (3, "div s t u v", "en"),
        ],
    )
    ranked = [r["doc_id"] for r in s.search(TermQuery("div"), 4).collect()]
    assert ranked == [0, 1, 2, 3]
    row = alpha_dcg_at_k(s, docs, "div", k=4).collect()[0]
    expect = sum(
        math.floor((0.5**c) / math.log2(r + 1) * 1e9 + 0.5)
        for r, c in [(1, 0), (2, 1), (3, 0), (4, 2)]
    )
    assert (row["k"], row["n_aspects_covered"], row["alpha_dcg_q9"]) == (4, 2, expect)


def test_alpha_dcg_rewards_diversity(spark):
    # same relevance pattern; interleaved aspects beat clustered ones
    clustered, s1 = _corpus(
        spark,
        [(i, "top " * (8 - i) + f"w{i}", "en" if i < 3 else "fr") for i in range(6)],
    )
    inter, s2 = _corpus(
        spark,
        [(i, "top " * (8 - i) + f"w{i}", "en" if i % 2 == 0 else "fr") for i in range(6)],
    )
    a1 = alpha_dcg_at_k(s1, clustered, "top", k=6).collect()[0]["alpha_dcg_q9"]
    a2 = alpha_dcg_at_k(s2, inter, "top", k=6).collect()[0]["alpha_dcg_q9"]
    assert a2 > a1


def test_iap_hand_computed(spark):
    # matching docs: en x3 (2 rel), fr x1 (1 rel); k=4 puts all in topk
    docs, s = _corpus(
        spark,
        [
            (0, "ia ia strong en doc", "en"),
            (1, "ia ia also relevant here", "en"),
            (2, "ia weak single hit", "en"),
            (3, "ia ia relevant fr doc", "fr"),
            (4, "nothing matching at all", "de"),
        ],
    )
    row = intent_aware_precision(s, docs, "ia", k=4, min_tf=2).collect()[0]
    # priors: en 3/4, fr 1/4; relk: en 2, fr 1
    # IA-P@4 = sum(cnt*relk)/(total*k) = (3*2 + 1*1)/(4*4)
    assert row["total_matching"] == 4
    assert row["ia_p_q6"] == math.floor(7 / 16 * 1e6)


def test_iap_zero_when_no_relevant(spark):
    docs, s = _corpus(spark, [(0, "solo hit only", "en"), (1, "other words here", "fr")])
    row = intent_aware_precision(s, docs, "solo", k=5, min_tf=2).collect()[0]
    assert row["ia_p_q6"] == 0  # the single match has tf 1 < 2
