"""Round-5 part-ze twins: term-dict front-coding and IndexOptions
sizing audits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.index.layout_stats import (
    index_options_size_audit,
    term_dict_prefix_stats,
)


def _idx(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return build_index(docs, text_col="text", id_col="doc_id")


def test_prefix_stats_hand_computed(spark):
    # sorted vocab: apple applesauce apply banana band
    idx = _idx(spark, ["applesauce apple apply", "banana band apple"])
    row = term_dict_prefix_stats(idx).collect()[0]
    # lcp chain: apple(0), applesauce(5), apply(4), banana(0), band(3)
    terms = ["apple", "applesauce", "apply", "banana", "band"]
    raw = sum(len(t) for t in terms)
    front = len("apple") + (10 - 5) + (5 - 4) + 6 + (4 - 3)
    assert (row["n_terms"], row["raw_bytes"], row["front_bytes"]) == (5, raw, front)
    assert row["savings_ppm"] == int((raw - front) / raw * 1e6)


def test_prefix_stats_identical_prefix_free_vocab_saves_nothing(spark):
    idx = _idx(spark, ["alpha beta gamma"])
    row = term_dict_prefix_stats(idx).collect()[0]
    # no shared prefixes between alpha/beta/gamma
    assert row["raw_bytes"] == row["front_bytes"]
    assert row["savings_ppm"] == 0


def test_index_options_audit_counts(spark):
    idx = _idx(spark, ["ant ant bee", "ant cat"])
    row = index_options_size_audit(idx).collect()[0]
    # postings: (d0,ant,tf2)(d0,bee,1)(d1,ant,1)(d1,cat,1) -> 4 postings, 5 occ
    assert row["n_postings"] == 4
    assert row["ints_docs_only"] == 4
    assert row["ints_docs_freqs"] == 8
    assert row["ints_positions"] == 8 + 5


def test_index_options_positions_equal_sum_tf(spark):
    idx = _idx(spark, ["x y x y x", "y z"])
    row = index_options_size_audit(idx).collect()[0]
    sum_tf = (
        idx.postings.agg(F.sum("tf")).collect()[0][0]
    )
    assert row["ints_positions"] - row["ints_docs_freqs"] == sum_tf
