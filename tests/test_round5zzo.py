"""Round-5 part-zzo twins: distributed top-k terms error bounds and
Dunning G2 significant terms."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from lucenenet_spark.functions.textstats import significant_terms_g2
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.sharded import distributed_topk_terms


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def test_dtk_exact_when_shard_k_large(spark):
    texts = ["aa bb", "aa cc", "aa bb dd", "bb ee", "cc ff", "aa gg"]
    idx = _index(spark, texts)
    rows = distributed_topk_terms(idx, n_shards=3, shard_k=50, k=5).collect()
    true = Counter(t for txt in texts for t in set(txt.split()))
    for r in rows:
        assert r["is_exact"]
        assert r["est_count"] == r["true_count"] == true[r["term"]]
    # top term is 'aa' (4 docs)
    assert rows[0]["term"] == "aa" and rows[0]["est_count"] == 4


def test_dtk_bound_holds_when_truncated(spark):
    # many distinct filler terms force shard_k=1 truncation
    texts = [f"hot f{i} g{i}" for i in range(12)]
    idx = _index(spark, texts)
    rows = distributed_topk_terms(idx, n_shards=4, shard_k=1, k=8).collect()
    assert rows
    for r in rows:
        assert r["est_count"] <= r["true_count"] <= r["est_count"] + r["err_bound"]
    # 'hot' is every shard's top-1 -> reported everywhere -> exact
    hot = next(r for r in rows if r["term"] == "hot")
    assert hot["is_exact"] and hot["err_bound"] == 0


def test_dtk_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        distributed_topk_terms(idx, n_shards=0)


def _g2_replica(texts, seed, term):
    docs = [set(t.split()) for t in texts]
    n = len(docs)
    fg = [d for d in docs if seed in d]
    nfg = len(fg)
    k11 = sum(1 for d in fg if term in d)
    df = sum(1 for d in docs if term in d)
    k12, k21 = nfg - k11, df - k11
    k22 = n - df - nfg + k11

    def c(k, row, col):
        return k * math.log((k * float(n)) / (row * col)) if k > 0 else 0.0

    g2 = 2.0 * (
        ((c(k11, nfg, df) + c(k12, nfg, n - df)) + c(k21, n - nfg, df))
        + c(k22, n - nfg, n - df)
    )
    return math.floor(g2 * 1e6 + 0.5), k11, df


def test_g2_replica_and_ranking(spark):
    # 'co' rides with 'seed'; 'bg' is everywhere (no lift)
    texts = (
        ["seed co bg x%d" % i for i in range(4)]
        + ["seed bg y%d" % i for i in range(2)]
        + ["bg z%d" % i for i in range(6)]
    )
    idx = _index(spark, texts)
    rows = {r["term"]: r for r in significant_terms_g2(idx, "seed", k=20, min_fg_df=2).collect()}
    for term in ("co", "bg"):
        want_g2, want_k11, want_df = _g2_replica(texts, "seed", term)
        assert rows[term]["g2_q6"] == want_g2
        assert rows[term]["k11"] == want_k11 and rows[term]["df"] == want_df
    assert rows["co"]["g2_q6"] > rows["bg"]["g2_q6"]
    assert "seed" not in rows


def test_g2_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        significant_terms_g2(idx, "nosuch")
    with pytest.raises(ValueError):
        significant_terms_g2(idx, "x", min_fg_df=0)
