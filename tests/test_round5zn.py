"""Round-5 part-zn twins: BPE tokenizer application and context-aware
spell correction."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.bpe import bpe_token_stats
from lucenenet_spark.functions.lm_quality import context_spell_correct


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


# -------------------------------------------------------------- bpe apply
def test_bpe_token_stats_low_lower(spark):
    # merges: (l,o) -> (lo,w) -> (e,r); final segmentation:
    # low -> [low? no: after (l,o),(lo,w): 'low']  lower -> [low, e, r] -> [low, er]
    rows = bpe_token_stats(_docs(spark, ["low low lower"]), n_merges=3, k=10).collect()
    got = {(r["token"], r["token_count"]) for r in rows}
    assert got == {("low", 3), ("er", 1)}
    ranks = {r["token"]: r["rank"] for r in rows}
    assert ranks["low"] == 1 and ranks["er"] == 2


def test_bpe_token_stats_counts_weighted(spark):
    # 'ab' x4, 'c' x1: merge 1 = (a,b); tokens: ab(4), c(1)
    rows = bpe_token_stats(_docs(spark, ["ab ab c", "ab ab"]), n_merges=1, k=10).collect()
    got = {(r["token"], r["token_count"]) for r in rows}
    assert got == {("ab", 4), ("c", 1)}


def test_bpe_token_stats_top_k_cut(spark):
    rows = bpe_token_stats(_docs(spark, ["abc def ghi"]), n_merges=1, k=2).collect()
    assert len(rows) == 2 and [r["rank"] for r in rows] == [1, 2]


def test_bpe_token_stats_validates_k(spark):
    with pytest.raises(ValueError):
        bpe_token_stats(_docs(spark, ["x"]), k=0)


# -------------------------------------------------------------- ctx spell
def test_context_spell_prefers_contextual_candidate(spark):
    # 'sot' is 1 edit from both 'sort' and 'dot'; context 'the' is
    # followed by 'sort' often, never by 'dot' -> 'sort' must win
    texts = ["the sort the sort the sort a dot", "the sort runs b dot"]
    rows = context_spell_correct(_docs(spark, texts), "the", "sot", k=5).collect()
    assert rows[0]["candidate"] == "sort"
    cands = {r["candidate"] for r in rows}
    assert "dot" in cands  # still a candidate, just ranked below


def test_context_spell_edit_penalty_orders_equal_context(spark):
    # 'rose' (dist 1 from 'rosa') vs 'roses' (dist 2): same context mass
    texts = ["the rose the roses the rose the roses"]
    rows = context_spell_correct(
        _docs(spark, texts), "the", "rosa", k=5, edit_penalty_q6=10**7
    ).collect()
    assert rows[0]["candidate"] == "rose" and rows[0]["dist"] == 1


def test_context_spell_python_replica(spark):
    texts = ["the cat sat on the mat", "the cot and the cap", "a cat a cot"]
    rows = context_spell_correct(_docs(spark, texts), "the", "cxt", k=10).collect()
    # replica of the KN bigram score
    pairs = []
    for t in texts:
        w = t.split()
        pairs += list(zip(w, w[1:]))
    from collections import Counter, defaultdict

    cb = Counter(pairs)
    c1 = Counter(w1 for w1, _ in pairs)
    n1f, n1b = defaultdict(set), defaultdict(set)
    for w1, w2 in cb:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    nt = len(cb)
    vocab = {w for t in texts for w in t.split()}
    want = []
    for c in vocab:
        dist = _lev(c, "cxt")
        if abs(len(c) - 3) > 2 or dist > 2:
            continue
        cbv = cb.get(("the", c), 0)
        n1bv = len(n1b.get(c, ()))
        if cbv == 0 and n1bv == 0:
            continue
        p = max(cbv - 0.75, 0.0) / c1["the"] + (
            0.75 * len(n1f["the"]) / c1["the"]
        ) * (n1bv / nt)
        lp = math.floor(math.log(p) * 1e6 + 0.5)
        want.append((lp - 5000000 * dist, c, dist, lp))
    want.sort(key=lambda x: (-x[0], x[1]))
    got = [(r["score_q6"], r["candidate"], r["dist"], r["lp_q6"]) for r in rows]
    assert got == want[:10]


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb_ in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb_))
    return dp[len(b)]


def test_context_spell_unseen_context_empty(spark):
    rows = context_spell_correct(
        _docs(spark, ["cat sat mat"]), "nosuchword", "cot", k=5
    ).collect()
    assert rows == []


def test_context_spell_validates_k(spark):
    with pytest.raises(ValueError):
        context_spell_correct(_docs(spark, ["x y"]), "x", "y", k=0)
