"""Round-5 part-zl twins: consistent-hash routing and Kneser-Ney
bigram smoothing."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.lm_quality import kneser_ney_bigram_logprob
from lucenenet_spark.search.sharded import (
    _hash_ring,
    consistent_hash_rebalance,
    consistent_hash_route,
)


def _docs(spark, n=60):
    return spark.createDataFrame([(i, "x") for i in range(n)], "doc_id long, text string")


# --------------------------------------------------------- consistent hash
def test_ring_is_sorted_and_collision_free():
    ring = _hash_ring(4, 16)
    assert len(ring) == 64
    assert [p for p, _ in ring] == sorted(p for p, _ in ring)
    assert len({p for p, _ in ring}) == 64


def test_route_covers_all_shards_and_is_deterministic(spark):
    docs = _docs(spark, 200)
    a = {r["doc_id"]: r["shard_id"] for r in consistent_hash_route(docs, 4).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in consistent_hash_route(docs, 4).collect()}
    assert a == b
    assert set(a.values()) <= {0, 1, 2, 3}
    assert len(set(a.values())) == 4  # 200 docs hit every shard w.h.p.


def test_moved_docs_all_land_on_new_shard(spark):
    docs = _docs(spark, 150)
    before = {r["doc_id"]: r["shard_id"] for r in consistent_hash_route(docs, 3).collect()}
    after = {r["doc_id"]: r["shard_id"] for r in consistent_hash_route(docs, 4).collect()}
    for d, s_b in before.items():
        if after[d] != s_b:
            assert after[d] == 3  # the consistent-hashing contract


def test_rebalance_audit_invariants(spark):
    docs = _docs(spark, 150)
    rows = {r["shard_id"]: r for r in consistent_hash_rebalance(docs, 3).collect()}
    total_before = sum(r["docs_before"] for r in rows.values())
    total_after = sum(r["docs_after"] for r in rows.values())
    assert total_before == total_after == 150
    assert rows[3]["docs_before"] == 0 and rows[3]["moved_out"] == 0
    assert sum(r["moved_out"] for r in rows.values()) == rows[3]["docs_after"]
    # moving 3 -> 4 shards should move roughly 1/4 of docs, not ~all
    assert rows[3]["docs_after"] < 75


def test_route_validates_inputs(spark):
    docs = _docs(spark, 3)
    with pytest.raises(ValueError):
        consistent_hash_route(docs, 0)
    with pytest.raises(ValueError):
        consistent_hash_route(docs, 2, vnodes=0)


# --------------------------------------------------------------- kneser-ney
def _kn_replica(pairs_train, pairs_test, d=0.75):
    from collections import Counter, defaultdict

    cb = Counter(pairs_train)
    c1 = Counter(w1 for w1, _ in pairs_train)
    n1f = defaultdict(set)
    n1b = defaultdict(set)
    for w1, w2 in cb:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    nt = len(cb)
    out = {}
    for w1, w2 in pairs_test:
        if w1 not in c1:
            continue
        p = max(cb.get((w1, w2), 0) - d, 0.0) / c1[w1] + (
            d * len(n1f[w1]) / c1[w1]
        ) * (len(n1b.get(w2, ())) / nt)
        if p == 0.0:
            continue
        out.setdefault("lp", []).append(math.floor(math.log(p) * 1e6 + 0.5))
    return out.get("lp", [])


def test_kn_hand_computed_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in kneser_ney_bigram_logprob(docs).collect()}
    # P(b|a) = 1.25/3 + (.75*2/3)*(1/2) ; P(c|a) = .25/3 + (.75*2/3)*(1/2)
    p_b = 1.25 / 3 + (0.75 * 2 / 3) * (1 / 2)
    p_c = 0.25 / 3 + (0.75 * 2 / 3) * (1 / 2)
    assert rows[0]["sum_lp_q6"] == math.floor(math.log(p_b) * 1e6 + 0.5)
    assert rows[2]["sum_lp_q6"] == math.floor(math.log(p_c) * 1e6 + 0.5)
    assert rows[0]["n_bigrams"] == 1


def test_kn_python_replica_on_mixed_corpus(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "the cat ran",
    ]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in kneser_ney_bigram_logprob(docs).collect()}
    all_pairs = [
        (t.split()[i], t.split()[i + 1]) for t in texts for i in range(len(t.split()) - 1)
    ]
    for did, t in enumerate(texts):
        w = t.split()
        lps = _kn_replica(all_pairs, list(zip(w, w[1:])))
        assert got[did]["n_bigrams"] == len(lps)
        assert got[did]["sum_lp_q6"] == sum(lps)


def test_kn_probabilities_sum_to_one_over_continuations(spark):
    # over a closed vocab, sum_w2 P_KN(w2|w1) == 1 for the interpolated form
    texts = ["a b a c a b a d", "b a c a"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    all_pairs = [
        (t.split()[i], t.split()[i + 1]) for t in texts for i in range(len(t.split()) - 1)
    ]
    from collections import Counter, defaultdict

    cb = Counter(all_pairs)
    c1 = Counter(w1 for w1, _ in all_pairs)
    n1f, n1b = defaultdict(set), defaultdict(set)
    for w1, w2 in cb:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    nt = len(cb)
    vocab = set(c1) | {w2 for _, w2 in all_pairs}
    for w1 in c1:
        tot = sum(
            max(cb.get((w1, w2), 0) - 0.75, 0.0) / c1[w1]
            + (0.75 * len(n1f[w1]) / c1[w1]) * (len(n1b.get(w2, ())) / nt)
            for w2 in vocab
        )
        assert abs(tot - 1.0) < 1e-9
    # and the Spark column agrees with the replica on every scored pair
    got = {r["doc_id"]: r["sum_lp_q6"] for r in kneser_ney_bigram_logprob(docs).collect()}
    for did, t in enumerate(texts):
        w = t.split()
        assert got[did] == sum(_kn_replica(all_pairs, list(zip(w, w[1:]))))


def test_kn_unseen_context_pairs_dropped(spark):
    train = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    test = spark.createDataFrame([(9, "zz qq")], "doc_id long, text string")
    assert kneser_ney_bigram_logprob(test, train=train).count() == 0
