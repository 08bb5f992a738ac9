"""Pytest twins for part-t: PageRank power iteration and Stupid-Backoff
bigram LM scoring (hand-computed goldens + invariants)."""

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.lm_quality import bigram_logprob
from lucenenet_spark.functions.pagerank import (
    build_link_graph,
    hits,
    pagerank,
    pagerank_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------
def test_pagerank_cycle_is_uniform(spark):
    # 0 -> 1 -> 2 -> 0: the uniform vector is stationary, every iteration
    # must reproduce exactly 1/3 (teleport + damping of 1/3 == 1/3)
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 0, 1)], "src long, dst long, deg long"
    )
    got = {r.doc_id: r.pr for r in pagerank(nodes, edges, iterations=4).collect()}
    expect = 0.15 / 3 + 0.85 * (1.0 / 3)
    for v in got.values():
        assert v == pytest.approx(1.0 / 3, abs=1e-12)
        assert v == pytest.approx(expect, abs=1e-12)


def test_pagerank_two_iterations_hand_computed(spark):
    # 1 -> 0, 2 -> 0, 0 -> 1 (all outdeg 1): replicate the loop in floats
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 0, 1), (2, 0, 1), (0, 1, 1)], "src long, dst long, deg long"
    )
    n, d = 3, 0.85
    tele = (1.0 - d) / float(n)
    r = {0: 1.0 / 3, 1: 1.0 / 3, 2: 1.0 / 3}
    for _ in range(2):
        r = {
            0: tele + d * (r[1] + r[2]),
            1: tele + d * r[0],
            2: tele + d * 0.0,
        }
    got = {x.doc_id: x.pr for x in pagerank(nodes, edges, iterations=2).collect()}
    for k in r:
        assert got[k] == pytest.approx(r[k], abs=1e-12)
    # node 2 receives only teleport mass; 1 inherits the 2-in-degree
    # hub's full mass one hop later and leads after two iterations
    assert got[1] > got[0] > got[2]


def test_link_graph_shape(spark):
    docs = _docs(spark, [(i, "x") for i in range(37)])
    e = build_link_graph(docs.select("doc_id")).collect()
    by_src = {}
    for row in e:
        assert 0 <= row.dst < 37 and row.dst != row.src
        assert row.deg == 1 + row.src % 3
        by_src.setdefault(row.src, []).append(row)
    assert set(by_src) == set(range(37))
    for src, rows in by_src.items():
        assert len(rows) == 1 + src % 3  # deg matches emitted multiplicity


def test_pagerank_mass_conserved_on_synthetic_graph(spark):
    docs = _docs(spark, [(i, "x") for i in range(50)])
    nodes = docs.select("doc_id")
    pr = pagerank(nodes, build_link_graph(nodes), iterations=5)
    total = pr.agg(F.sum("pr")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)  # outdeg >= 1 everywhere


def test_pagerank_topk_order_and_quantization(spark):
    docs = _docs(spark, [(i, "x") for i in range(50)])
    rows = pagerank_topk(docs, k=10).collect()
    assert len(rows) == 10
    assert [r.rank_q for r in rows] == sorted(
        (r.rank_q for r in rows), reverse=True
    )
    # ties (if any) break by ascending doc_id
    for a, b in zip(rows, rows[1:]):
        if a.rank_q == b.rank_q:
            assert a.doc_id < b.doc_id


def test_personalized_pagerank_hand_computed(spark):
    # cycle 0 -> 1 -> 2 -> 0 with all teleport mass on node 0
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 0, 1)], "src long, dst long, deg long"
    )
    tp = spark.createDataFrame([(0, 1.0)], "doc_id long, tp double")
    d = 0.85
    r = {0: 1.0, 1: 0.0, 2: 0.0}
    for _ in range(3):
        r = {
            0: (1.0 - d) * 1.0 + d * r[2],
            1: (1.0 - d) * 0.0 + d * r[0],
            2: (1.0 - d) * 0.0 + d * r[1],
        }
    got = {
        x.doc_id: x.pr
        for x in pagerank(nodes, edges, iterations=3, teleport=tp).collect()
    }
    for k in r:
        assert got[k] == pytest.approx(r[k], abs=1e-12)
    assert got[0] > got[1] > got[2]  # rank decays with hop distance from seed


def test_uniform_teleport_matches_default(spark):
    docs = _docs(spark, [(i, "x") for i in range(30)])
    nodes = docs.select("doc_id")
    edges = build_link_graph(nodes)
    tp = nodes.select("doc_id", (F.lit(1.0) / F.lit(30.0)).alias("tp"))
    a = {r.doc_id: r.pr for r in pagerank(nodes, edges, iterations=3).collect()}
    b = {
        r.doc_id: r.pr
        for r in pagerank(nodes, edges, iterations=3, teleport=tp).collect()
    }
    assert a == b  # bitwise: the default IS the uniform teleport vector


def test_hits_bipartite_hand_structure(spark):
    # hubs {0,1} point at authorities {2,3}: 0 -> 2, 0 -> 3, 1 -> 2
    nodes = spark.createDataFrame([(0,), (1,), (2,), (3,)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 2, 2), (0, 3, 2), (1, 2, 1)], "src long, dst long, deg long"
    )
    got = {r.doc_id: r for r in hits(nodes, edges, iterations=3).collect()}
    # L1 normalization: both vectors sum to 1
    assert sum(r.a for r in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(r.h for r in got.values()) == pytest.approx(1.0, abs=1e-12)
    # 2 is cited by both hubs -> top authority; 0 cites both -> top hub
    assert got[2].a > got[3].a > 0 and got[0].a == got[1].a == 0.0
    assert got[0].h > got[1].h > 0 and got[2].h == got[3].h == 0.0


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram LM
# ---------------------------------------------------------------------------
def test_bigram_logprob_hand_computed(spark):
    # train: "a b a b" -> c(a,b)=2 c(b,a)=1; uni a=2 b=2; T=4
    train = _docs(spark, [(0, "a b a b")])
    docs = _docs(
        spark,
        [
            (1, "a b c"),  # (a,b) seen: 2/2=1; (b,c) unseen, c OOV: .4*1/4
            (2, "b a"),  # (b,a) seen: 1/2
            (3, "solo"),  # < 2 tokens: unscorable, absent
        ],
    )
    got = {r.doc_id: r for r in bigram_logprob(docs, train=train).collect()}
    assert 3 not in got
    lp1 = (math.log(1.0) + math.log(0.4 * 1 / 4.0)) / 2
    assert got[1].n_bigrams == 2
    assert got[1].avg_logprob_q == math.floor(lp1 * 10000 + 0.5)
    assert got[2].n_bigrams == 1
    assert got[2].avg_logprob_q == math.floor(math.log(0.5) * 10000 + 0.5)


def test_bigram_backoff_uses_seen_unigram(spark):
    # unseen bigram (b,b) but seen unigram b -> .4 * c(b)/T = .4*2/4
    train = _docs(spark, [(0, "a b a b")])
    docs = _docs(spark, [(1, "b b")])
    row = bigram_logprob(docs, train=train).collect()[0]
    assert row.avg_logprob_q == math.floor(math.log(0.4 * 2 / 4.0) * 10000 + 0.5)


def test_bigram_self_model_never_backs_off(spark):
    # model == corpus: every doc bigram is seen, so every score is
    # c(w1,w2)/c(w1) — all probabilities <= 1, and a doc made of the
    # corpus's only deterministic continuation scores ln(1)=0
    docs = _docs(spark, [(0, "x y"), (1, "x y")])
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    for r in got.values():
        assert r.avg_logprob_q == 0  # P(y|x)=1 in both docs


def test_bigram_empty_token_runs_collapse(spark):
    # double spaces vanish before adjacency (pair is (a,b), not (a,''))
    train = _docs(spark, [(0, "a  b")])
    docs = _docs(spark, [(1, "a  b")])
    row = bigram_logprob(docs, train=train).collect()[0]
    assert row.n_bigrams == 1 and row.avg_logprob_q == 0


# ---------------------------------------------------------------------------
# CCNet head/middle/tail LM bucketing
# ---------------------------------------------------------------------------
def test_lm_buckets_equal_frequency_and_ordering(spark):
    from lucenenet_spark.functions.lm_quality import lm_buckets

    rows = [
        (i, " ".join(["common"] * 5 + ["rare%d" % i] * (i % 4)), "en")
        for i in range(12)
    ] + [(100 + i, "unico texto %d aqui" % i, "es") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = lm_buckets(df, n_buckets=3).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r.bucket == b) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)  # equal frequency
        # head scores dominate tail scores within the language
        head = [r.avg_logprob_q for r in rs if r.bucket == 1]
        tail = [r.avg_logprob_q for r in rs if r.bucket == 3]
        assert min(head) >= max(tail)


def test_lm_buckets_deterministic(spark):
    from lucenenet_spark.functions.lm_quality import lm_buckets

    df = spark.createDataFrame(
        [(i, "tok same same", "en") for i in range(9)],
        "doc_id long, text string, lang string",
    )
    a = {r.doc_id: r.bucket for r in lm_buckets(df).collect()}
    b = {r.doc_id: r.bucket for r in lm_buckets(df).collect()}
    assert a == b  # all-tied scores still bucket identically (id tiebreak)


# ---------------------------------------------------------------------------
# TextCat language ID
# ---------------------------------------------------------------------------
def test_textcat_separates_obvious_languages(spark):
    from lucenenet_spark.functions.textcat import textcat_classify

    rows = []
    for i in range(6):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(6, 12):
        rows.append((i, "der schnelle braune fuchs springt über den hund", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.lang_pred for r in textcat_classify(df, df).collect()}
    assert all(got[i] == "en" for i in range(6))
    assert all(got[i] == "de" for i in range(6, 12))


def test_textcat_distance_is_integer_and_deterministic(spark):
    from lucenenet_spark.functions.textcat import textcat_classify

    df = spark.createDataFrame(
        [(0, "alpha beta gamma", "en"), (1, "alpha beta gamma", "en")],
        "doc_id long, text string, lang string",
    )
    a = sorted(tuple(r) for r in textcat_classify(df, df).collect())
    b = sorted(tuple(r) for r in textcat_classify(df, df).collect())
    assert a == b
    # identical docs, single language: identical exact-integer distances
    assert a[0][1:] == a[1][1:]
    assert isinstance(a[0][2], int)


def test_textcat_out_of_place_penalty(spark):
    from lucenenet_spark.functions.textcat import textcat_classify

    train = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa", "aa"), (1, "bbbb bbbb bbbb", "bb")],
        "doc_id long, text string, lang string",
    )
    docs = spark.createDataFrame(
        [(9, "cccc cccc", "xx")], "doc_id long, text string, lang string"
    )
    got = textcat_classify(docs, train, top_n=40).collect()[0]
    # no gram overlap with either profile: every doc gram pays the max
    # out-of-place penalty; tie on distance breaks to 'aa'
    assert got.lang_pred == "aa"
    n_doc_grams = len({"_c", "cc", "c_", "_cc", "ccc", "cc_"})
    assert got.dist == 40 * n_doc_grams
