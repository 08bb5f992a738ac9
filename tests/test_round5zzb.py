"""Round-5 part-zzb twins: selective search and IDF divergence."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import (
    local_idf_divergence,
    selective_search_topk,
)


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, idx, IndexSearcher(idx, mode="double")


# ---------------------------------------------------------- selective search
def test_selective_probe_all_shards_is_exact(spark):
    rows = [(i, "hit f%d" % i, "S%d" % (i % 3)) for i in range(30)]
    docs, _, s = _engine(spark, rows)
    out = selective_search_topk(
        s, docs, "hit", n_probe=3, k=5, sample_mod=1, n_sample_top=30
    ).collect()
    assert all(r["global_overlap"] == 5 for r in out)


def test_selective_topical_concentration_keeps_recall(spark):
    # every 'zebra' doc lives in shard T; ReDDE must route there and
    # lose nothing even with n_probe=1
    rows = []
    for i in range(30):
        if i % 3 == 0:
            rows.append((i, "zebra z%d" % i, "T"))
        else:
            rows.append((i, "other o%d" % i, "S%d" % (i % 2)))
    docs, _, s = _engine(spark, rows)
    out = selective_search_topk(
        s, docs, "zebra", n_probe=1, k=10, sample_mod=3, n_sample_top=10
    ).collect()
    assert {r["shard"] for r in out} == {"T"}
    assert all(r["global_overlap"] == len(out) for r in out)


def test_selective_validates_params(spark):
    docs, _, s = _engine(spark, [(0, "x", "A")])
    with pytest.raises(ValueError):
        selective_search_topk(s, docs, "x", n_probe=0)


# ------------------------------------------------------------ idf divergence
def test_idf_divergence_uniform_term_hand_computed(spark):
    # term in every doc: df_s == n_s per shard, but the +0.5 smoothing
    # makes idf = ln(1 + 0.5/(n+0.5)) depend on the ABSOLUTE size, so
    # small shards still diverge — exactly the effect the audit exists
    # to expose
    rows = [(i, "every x%d" % i, "A") for i in range(8)]
    _, idx, _ = _engine(spark, rows)
    out = {r["term"]: r for r in local_idf_divergence(idx, ["every"], n_shards=4).collect()}
    g = math.floor(math.log(1 + 0.5 / 8.5) * 1e6 + 0.5)
    l = math.floor(math.log(1 + 0.5 / 2.5) * 1e6 + 0.5)  # every shard n_s=2
    assert out["every"]["idf_global_q6"] == g
    assert out["every"]["max_abs_dev_q6"] == abs(l - g)
    assert out["every"]["n_shards_present"] == 4


def test_idf_divergence_skewed_term_diverges(spark):
    # 'rare' only in shard 0 (doc_id % 2 == 0 half): local idf in shard
    # 0 is much lower than global
    rows = []
    for i in range(16):
        rows.append((i, ("rare r%d" % i) if i % 2 == 0 else ("blah b%d" % i), "A"))
    _, idx, _ = _engine(spark, rows)
    row = local_idf_divergence(idx, ["rare"], n_shards=2).collect()[0]
    n, df = 16.0, 8.0
    g = math.floor(math.log(1 + (n - df + 0.5) / (df + 0.5)) * 1e6 + 0.5)
    l0 = math.floor(math.log(1 + (8.0 - 8.0 + 0.5) / (8.0 + 0.5)) * 1e6 + 0.5)
    assert row["idf_global_q6"] == g
    assert row["max_abs_dev_q6"] == abs(l0 - g)
    assert row["n_shards_present"] == 1  # shard 1 has no 'rare' postings


def test_idf_divergence_validates(spark):
    _, idx, _ = _engine(spark, [(0, "x", "A")])
    with pytest.raises(ValueError):
        local_idf_divergence(idx, [])
    with pytest.raises(ValueError):
        local_idf_divergence(idx, ["x"], n_shards=0)
