"""Round-5 part-zu twins: Elias-Fano audit and tiered serving."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.docid_layout import elias_fano_audit
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import tiered_serving_certificate


def _idx(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


# ---------------------------------------------------------------- elias-fano
def _ef_bits(n, u):
    l = max(0, (u // n).bit_length() - 1)
    return n * l + n + -(-u // (1 << l))


def test_ef_closed_form_matches_python(spark):
    texts = ["alpha beta"] * 6 + ["beta only%d" % i for i in range(2)]
    idx = _idx(spark, texts)
    rows = {r["term"]: r for r in elias_fano_audit(idx, top_terms=5).collect()}
    u = 8
    assert rows["beta"]["df"] == 8 and rows["beta"]["ef_bits"] == _ef_bits(8, u)
    assert rows["alpha"]["df"] == 6 and rows["alpha"]["ef_bits"] == _ef_bits(6, u)


def test_ef_gap_bits_dense_list(spark):
    # term in every doc: gaps all 1 -> gap_bits == df
    idx = _idx(spark, ["tok x%d" % i for i in range(7)])
    r = [x for x in elias_fano_audit(idx, top_terms=1).collect()][0]
    assert r["term"] == "tok" and r["gap_bits"] == 7


def test_ef_gap_bits_sparse_list(spark):
    # 'rare' only in docs 0 and 4: gaps 1, 4 -> bits 1 + 3 = 4
    texts = ["rare x", "x y", "x y", "x y", "rare x"]
    idx = _idx(spark, texts)
    rows = {r["term"]: r for r in elias_fano_audit(idx, top_terms=3).collect()}
    assert rows["rare"]["gap_bits"] == 4


# ------------------------------------------------------------------- tiered
def test_tiered_full_term_in_tier1_certifies(spark):
    idx = _idx(spark, ["probe w%d" % i for i in range(8)])
    rows = tiered_serving_certificate(idx, "probe", m=20, k=5).collect()
    assert all(r["certified"] == 1 and r["tier2_max_q"] == 0 for r in rows)
    assert len(rows) == 5


def test_tiered_page_matches_full_search_when_certified(spark):
    texts = ["probe " * (i % 4 + 1) + "pad x y" for i in range(30)]
    idx = _idx(spark, texts)
    s = IndexSearcher(idx, mode="double")
    rows = tiered_serving_certificate(idx, "probe", m=12, k=5).collect()
    full = (
        s.scored(TermQuery("probe"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    if rows[0]["certified"] == 1:
        assert [(r["doc_id"], r["score_q"]) for r in rows] == [
            (r["doc_id"], r["q"]) for r in full
        ]
    # tier2 exists here (30 postings > m=12)
    assert rows[0]["tier2_max_q"] > 0


def test_tiered_certificate_semantics(spark):
    # identical docs: every posting has the SAME impact, so with
    # tier2 non-empty the kth equals tier2_max -> still certified (>=)
    idx = _idx(spark, ["same text here"] * 10)
    rows = tiered_serving_certificate(idx, "same", m=6, k=3).collect()
    assert all(r["certified"] == 1 for r in rows)
    assert rows[0]["tier2_max_q"] == rows[0]["score_q"]


def test_tiered_validates_inputs(spark):
    idx = _idx(spark, ["x y"])
    with pytest.raises(ValueError):
        tiered_serving_certificate(idx, "x", m=5, k=6)
    with pytest.raises(ValueError):
        tiered_serving_certificate(idx, "x", m=0, k=0)
