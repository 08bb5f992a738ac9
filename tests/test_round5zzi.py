"""Round-5 part-zzi twins: pre-retrieval QPP predictors and the
axiomatic F2EXP/F2LOG retrieval functions."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.axiomatic import axiomatic_scored
from lucenenet_spark.search.quality import preretrieval_qpp
from lucenenet_spark.search.searcher import IndexSearcher


def _build(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


def _q9(x):
    return math.floor(x * 1e9 + 0.5)


def test_qpp_replica(spark):
    texts = ["cat cat dog", "cat fish", "dog dog dog", "fish fish"]
    idx, _ = _build(spark, texts)
    rows = {r["term"]: r for r in preretrieval_qpp(idx, ["cat", "dog"]).collect()}
    n, c = 4.0, 10.0  # 4 docs, 10 tokens
    # cat: df 2, cf 3; dog: df 2, cf 4
    assert (rows["cat"]["df"], rows["cat"]["cf"]) == (2, 3)
    assert rows["cat"]["idf_q9"] == _q9(math.log(n / 2))
    assert rows["cat"]["ictf_q9"] == _q9(math.log(c / 3))
    assert rows["cat"]["scq_q9"] == _q9((1 + math.log(3)) * math.log(1 + n / 2))
    # scope: docs holding cat or dog = {0,1,2} -> -ln(3/4), same on all rows
    want_scope = _q9(-math.log(3 / n))
    assert rows["cat"]["scope_q9"] == want_scope
    assert rows["dog"]["scope_q9"] == want_scope


def test_qpp_oov_term_nulls(spark):
    idx, _ = _build(spark, ["cat dog", "dog fish"])
    rows = {r["term"]: r for r in preretrieval_qpp(idx, ["dog", "unicorn"]).collect()}
    u = rows["unicorn"]
    assert (u["df"], u["cf"]) == (0, 0)
    assert u["idf_q9"] is None and u["ictf_q9"] is None and u["scq_q9"] is None
    assert u["scope_q9"] == rows["dog"]["scope_q9"]


def test_qpp_rarer_term_higher_idf(spark):
    texts = ["cat x", "cat y", "cat z", "dog w"]
    idx, _ = _build(spark, texts)
    rows = {r["term"]: r for r in preretrieval_qpp(idx, ["cat", "dog"]).collect()}
    assert rows["dog"]["idf_q9"] > rows["cat"]["idf_q9"]


def test_qpp_validation(spark):
    idx, _ = _build(spark, ["x y"])
    with pytest.raises(ValueError):
        preretrieval_qpp(idx, [])
    with pytest.raises(ValueError):
        preretrieval_qpp(idx, ["x", "x"])


def _axiomatic_replica(texts, terms, variant, s=0.5, k=0.35):
    toks = [t.split() for t in texts]
    n = len(texts)
    dls = [len(t) for t in toks]
    avgdl = sum(dls) / n
    out = {}
    for term in terms:
        df = sum(1 for t in toks if term in t)
        if df == 0:
            continue
        w = (n / df) ** k if variant == "f2exp" else math.log((n + 1) / df)
        for d, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                out[d] = out.get(d, 0.0) + w * tf / (tf + s + s * dls[d] / avgdl)
    return out


@pytest.mark.parametrize("variant", ["f2exp", "f2log"])
def test_axiomatic_replica(spark, variant):
    texts = ["cat cat dog fish", "cat dog", "dog dog dog", "fish fish fish fish"]
    _, s = _build(spark, texts)
    got = {
        r["doc_id"]: r["score"]
        for r in axiomatic_scored(s, ["cat", "dog"], variant=variant).collect()
    }
    want = _axiomatic_replica(texts, ["cat", "dog"], variant)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_axiomatic_oov_term_ignored(spark):
    texts = ["cat x", "cat y"]
    _, s = _build(spark, texts)
    one = {r["doc_id"]: r["score"] for r in axiomatic_scored(s, ["cat"]).collect()}
    both = {r["doc_id"]: r["score"] for r in axiomatic_scored(s, ["cat", "unicorn"]).collect()}
    assert one == both
    assert axiomatic_scored(s, ["unicorn"]).count() == 0


def test_axiomatic_validation(spark):
    _, s = _build(spark, ["x y"])
    with pytest.raises(ValueError):
        axiomatic_scored(s, ["x"], variant="f9")
    with pytest.raises(ValueError):
        axiomatic_scored(s, [])
