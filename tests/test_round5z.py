"""Round-5 part-z twins: spam mass and query segmentation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.pagerank import build_link_graph, pagerank, spam_mass
from lucenenet_spark.functions.textstats import segment_queries


# ---------------------------------------------------------------- spam mass
def _docs(spark, n):
    return spark.createDataFrame([(i, f"t {i}") for i in range(n)], "doc_id long, text string")


def test_spam_mass_matches_component_pageranks(spark):
    docs = _docs(spark, 30)
    nodes = docs.select("doc_id")
    edges = build_link_graph(nodes)
    pr = {r["doc_id"]: r["pr"] for r in pagerank(nodes, edges).collect()}
    seeds = nodes.filter(F.col("doc_id") % 10 == 0)
    s = seeds.count()
    tp = seeds.select("doc_id", (F.lit(1.0) / F.lit(float(s))).alias("tp"))
    ppr = {
        r["doc_id"]: r["pr"] for r in pagerank(nodes, edges, teleport=tp).collect()
    }
    got = {r["doc_id"]: (r["pr_q"], r["sm_q5"]) for r in spam_mass(docs, k=30).collect()}
    n = 30
    for d, (pr_q, sm_q5) in got.items():
        assert pr_q == math.floor(pr[d] * 1e7 + 0.5)
        expect = math.floor((pr[d] - ppr[d] * (s / n)) / pr[d] * 1e5 + 0.5)
        assert sm_q5 == expect


def test_spam_mass_linearity_of_teleport_scaling(spark):
    # PPR(teleport 1/|S|) * s/n == PR with teleport 1/n per seed, by
    # linearity of the power iteration (up to fp noise far below 1e-9)
    docs = _docs(spark, 20)
    nodes = docs.select("doc_id")
    edges = build_link_graph(nodes)
    seeds = nodes.filter(F.col("doc_id") % 10 == 0)
    s, n = seeds.count(), 20
    tp_norm = seeds.select("doc_id", (F.lit(1.0 / s)).alias("tp"))
    tp_paper = seeds.select("doc_id", (F.lit(1.0 / n)).alias("tp"))
    a = {r["doc_id"]: r["pr"] * (s / n) for r in pagerank(nodes, edges, teleport=tp_norm).collect()}
    b = {r["doc_id"]: r["pr"] for r in pagerank(nodes, edges, teleport=tp_paper).collect()}
    for d in a:
        assert abs(a[d] - b[d]) < 1e-12


def test_spam_mass_trusted_seeds_rank_low(spark):
    # seeds receive teleport mass in the trusted run, so their rank is
    # well explained by the core: every seed's spam mass must sit below
    # the top suspects'
    rows = spam_mass(_docs(spark, 50), k=50).collect()
    sm = {r["doc_id"]: r["sm_q5"] for r in rows}
    seed_max = max(v for d, v in sm.items() if d % 10 == 0)
    top_suspect = max(v for d, v in sm.items() if d % 10 != 0)
    assert seed_max < top_suspect


# ---------------------------------------------------------- segmentation
def test_segmentation_boundaries_match_pmi_signs(spark):
    # 'new york' always adjacent (strong collocation); 'pizza' follows
    # york only once among many contexts -> pmi(york, pizza) <= 0
    texts = ["new york " + f"w{i} pizza pasta w{i}" for i in range(14)]
    texts += ["pizza near me now", "pasta pizza w0 w1"]
    docs = spark.createDataFrame(
        [(i * 7, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )  # ids multiples of 7 so every doc becomes a query
    rows = segment_queries(docs, query_mod=7, k=100).collect()
    byq = {r["doc_id"]: r for r in rows}
    r0 = byq[0]  # query: 'new york w0'
    assert r0["query"] == "new york w0"
    assert r0["pmi12_q"] > 0  # new+york perfectly associated
    assert r0["segmentation"].startswith("new york")
    # python replica of both pmi values
    toks = [t.split() for t in texts]
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    T = sum(uni.values())
    B = sum(big.values())

    def pmi_q(a, b):
        val = math.log((big[(a, b)] / B) / ((uni[a] / T) * (uni[b] / T)))
        return math.floor(val * 1e6 + 0.5)

    for r in rows:
        w1, w2, w3 = r["query"].split(" ")
        assert r["pmi12_q"] == pmi_q(w1, w2)
        assert r["pmi23_q"] == pmi_q(w2, w3)
        want = (
            w1
            + (" " if r["pmi12_q"] > 0 else "|")
            + w2
            + (" " if r["pmi23_q"] > 0 else "|")
            + w3
        )
        assert r["segmentation"] == want


def test_segmentation_requires_three_tokens_and_mod(spark):
    docs = spark.createDataFrame(
        [(0, "only two"), (7, "a b c d"), (3, "x y z")],
        "doc_id long, text string",
    )
    rows = segment_queries(docs, query_mod=7, k=10).collect()
    # doc 0 too short, doc 3 not % 7 -> only doc 7 qualifies
    assert [r["doc_id"] for r in rows] == [7]
    assert rows[0]["query"] == "a b c"
