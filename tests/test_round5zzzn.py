"""Round-5 part-zzzn twins: Chao1 / jackknife / Simpson vocab richness."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from lucenenet_spark.functions.textstats import vocab_richness


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_rich(events):
    c = Counter(events)
    v = len(c)
    f1 = sum(1 for n in c.values() if n == 1)
    f2 = sum(1 for n in c.values() if n == 2)
    nt = sum(c.values())
    rep2 = sum(n * (n - 1) for n in c.values())
    chao = (
        v + f1 * f1 / (2.0 * f2) if f2 > 0 else v + f1 * (f1 - 1) / 2.0
    )
    simpson = (
        math.floor(rep2 / float(nt * (nt - 1)) * 1e9 + 0.5) if nt > 1 else 0
    )
    return (v, f1, f2, nt, math.floor(chao * 100.0 + 0.5), v + f1, simpson)


def _bigrams(texts):
    out = []
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        out += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return out


def _unigrams(texts):
    return [w for t in texts for w in t.split(" ") if w]


def test_unigram_replica(spark):
    texts = ["a b b c c c", "d a  b", "e"]
    r = vocab_richness(_docs(spark, texts), ngram=1).collect()[0]
    got = (r["v_obs"], r["f1"], r["f2"], r["n_tokens"],
           r["chao1_q2"], r["jack1"], r["simpson_q9"])
    assert got == _py_rich(_unigrams(texts))


def test_bigram_replica(spark):
    texts = ["a b c a b", "b c d", "x y"]
    r = vocab_richness(_docs(spark, texts), ngram=2).collect()[0]
    got = (r["v_obs"], r["f1"], r["f2"], r["n_tokens"],
           r["chao1_q2"], r["jack1"], r["simpson_q9"])
    assert got == _py_rich(_bigrams(texts))


def test_no_hapax_collapses_to_v(spark):
    texts = ["a a b b", "a b"]  # every type appears >= 2 times, f1 = 0
    r = vocab_richness(_docs(spark, texts), ngram=1).collect()[0]
    assert r["f1"] == 0
    assert r["chao1_q2"] == r["v_obs"] * 100 and r["jack1"] == r["v_obs"]


def test_f2_zero_bias_corrected_branch(spark):
    texts = ["a b c"]  # all hapax: f1=3, f2=0 -> chao = V + f1(f1-1)/2 = 6
    r = vocab_richness(_docs(spark, texts), ngram=1).collect()[0]
    assert r["f2"] == 0 and r["chao1_q2"] == 600


def test_simpson_single_type_is_one(spark):
    texts = ["z z z z"]
    r = vocab_richness(_docs(spark, texts), ngram=1).collect()[0]
    assert r["simpson_q9"] == 1_000_000_000


def test_ngram_validation(spark):
    with pytest.raises(ValueError):
        vocab_richness(_docs(spark, ["a b"]), ngram=3)
