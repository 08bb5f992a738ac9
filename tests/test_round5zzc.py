"""Round-5 part-zzc twins: HostRank and webgraph locality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.pagerank import (
    build_link_graph,
    hostrank_topk,
    webgraph_locality,
)


def _docs(spark, n, hosts=2):
    return spark.createDataFrame(
        [(i, "t%d" % i, "h%d" % (i % hosts)) for i in range(n)],
        "doc_id long, text string, source string",
    )


# ----------------------------------------------------------------- hostrank
def test_hostrank_mass_conserved_and_ranked(spark):
    docs = _docs(spark, 40, hosts=4)
    rows = hostrank_topk(docs, iterations=3, k=10).collect()
    assert len(rows) == 4
    total = sum(r["pr_q7"] for r in rows)
    # no dangling hosts: total rank mass stays ~1 (quantization slack)
    assert abs(total - 10_000_000) <= 4
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]


def test_hostrank_single_host_gets_all_mass(spark):
    docs = _docs(spark, 12, hosts=1)
    rows = hostrank_topk(docs, iterations=2, k=5).collect()
    assert len(rows) == 1
    assert rows[0]["host"] == "h0" and rows[0]["pr_q7"] == 10_000_000


def test_hostrank_python_replica(spark):
    docs = _docs(spark, 20, hosts=3)
    got = {r["host"]: r["pr_q7"] for r in hostrank_topk(docs, iterations=2, k=10).collect()}
    edges = [
        (r["src"] % 3, r["dst"] % 3)
        for r in build_link_graph(docs.select("doc_id")).collect()
    ]
    hosts = sorted({h for e in edges for h in e})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(hosts)
    pr = {h: 1.0 / n for h in hosts}
    for _ in range(2):
        m = {h: 0.0 for h in hosts}
        for s, d in edges:
            m[d] += pr[s] / deg[s]
        pr = {h: 0.15 * (1.0 / n) + 0.85 * m[h] for h in hosts}
    import math

    for h in hosts:
        assert got["h%d" % h] == math.floor(pr[h] * 1e7 + 0.5)


def test_hostrank_validates(spark):
    docs = _docs(spark, 4)
    with pytest.raises(ValueError):
        hostrank_topk(docs, iterations=0)


# ----------------------------------------------------------------- locality
def test_locality_counts_are_exact(spark):
    docs = _docs(spark, 30)
    row = webgraph_locality(docs, window=16).collect()[0]
    edges = build_link_graph(docs.select("doc_id")).collect()
    gaps = [abs(r["src"] - r["dst"]) for r in edges]
    assert row["n_edges"] == len(gaps)
    assert row["within_window"] == sum(1 for g in gaps if g <= 16)
    assert row["gap_bits"] == sum((g + 1).bit_length() for g in gaps)


def test_locality_window_monotone(spark):
    docs = _docs(spark, 50)
    a = webgraph_locality(docs, window=4).collect()[0]["within_window"]
    b = webgraph_locality(docs, window=64).collect()[0]["within_window"]
    assert a <= b


def test_locality_validates(spark):
    docs = _docs(spark, 4)
    with pytest.raises(ValueError):
        webgraph_locality(docs, window=0)
