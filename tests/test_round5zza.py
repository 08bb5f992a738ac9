"""Round-5 part-zza twins: ReDDE selection and PForDelta sizing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.docid_layout import pfordelta_size_audit
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import redde_shard_selection


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, IndexSearcher(idx, mode="double")


# --------------------------------------------------------------------- redde
def test_redde_estimates_track_shard_relevance(spark):
    # shard A holds 8 of the 10 sampled matches, shard B 2
    rows = []
    for i in range(40):
        src = "A" if i % 4 != 0 else "B"
        rows.append((i, "hit filler%d" % i, src))
    docs, s = _engine(spark, rows)
    out = redde_shard_selection(s, docs, "hit", sample_mod=2, n_sample_top=20).collect()
    ranked = [(r["shard"], r["sample_hits"], r["est_docs"]) for r in out]
    # sample = even doc_ids (20 docs); i%4==0 even docs = 10 B? -> check counts:
    # even i: i%4 in {0,2}: B when i%4==0 (10 docs), A when i%4==2 (10 docs)
    assert {x[0] for x in ranked} == {"A", "B"}
    for shard, hits, est in ranked:
        assert est == hits * 2
    assert sum(x[1] for x in ranked) == 20


def test_redde_rank_order_and_tie_break(spark):
    rows = [(i, "hit x", "S%d" % (i % 2)) for i in range(8)]
    docs, s = _engine(spark, rows)
    out = redde_shard_selection(s, docs, "hit", sample_mod=1, n_sample_top=8).collect()
    # equal hits -> tie-break shard ASC
    assert [r["shard"] for r in out] == ["S0", "S1"]
    assert [r["rank"] for r in out] == [1, 2]


def test_redde_validates_params(spark):
    docs, s = _engine(spark, [(0, "x", "A")])
    with pytest.raises(ValueError):
        redde_shard_selection(s, docs, "x", sample_mod=0)


# ------------------------------------------------------------------ pfordelta
def _idx(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def test_pfor_uniform_gaps_no_exceptions(spark):
    # term in every doc: every gap is 1 -> b = 1, zero exceptions
    idx = _idx(spark, ["tok w%d" % i for i in range(20)])
    row = pfordelta_size_audit(idx, top_terms=1, block=8).collect()[0]
    assert row["term"] == "tok" and row["df"] == 20
    assert row["exceptions"] == 0
    assert row["n_blocks"] == 3  # 8 + 8 + 4
    assert row["total_bits"] == 20 * 1  # n_b * b summed, b=1 everywhere


def test_pfor_outlier_gap_becomes_exception(spark):
    # doc ids 0..8 then 100: block of 10 gaps = nine 1-bit + one 7-bit
    texts = {i: "tok pad" for i in list(range(9)) + [100]}
    rows = [(d, t) for d, t in texts.items()]
    docs = rows + [(j, "other x") for j in range(9, 100) if j != 100]
    df = spark.createDataFrame(sorted(docs), "doc_id long, text string")
    idx = build_index(df, text_col="text", id_col="doc_id")
    row = [r for r in pfordelta_size_audit(idx, top_terms=4, block=16).collect()
           if r["term"] == "tok"][0]
    # 10 gaps in one block: 90th pct rank = ceil(9) = 9 -> b = 1 (ninth
    # smallest gap is 1); the 92-gap (7 bits) is the lone exception
    assert row["n_blocks"] == 1
    assert row["exceptions"] == 1
    assert row["total_bits"] == 10 * 1 + 32


def test_pfor_validates_params(spark):
    idx = _idx(spark, ["x y"])
    with pytest.raises(ValueError):
        pfordelta_size_audit(idx, block=0)
    with pytest.raises(ValueError):
        pfordelta_size_audit(idx, pct_num=10, pct_den=10)
