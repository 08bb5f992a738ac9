"""Round-5 part-zb twins: count-min sketch and LTR feature export."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.sketches import cms_estimate, cms_sketch
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.ltr import ltr_features
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _h(j: int, v: str, width: int) -> int:
    return int(hashlib.md5(f"{j}#{v}".encode()).hexdigest()[:8], 16) % width


# ------------------------------------------------------------------- CMS
def test_cms_estimate_upper_bounds_and_matches_replica(spark):
    stream = ["a"] * 50 + ["b"] * 20 + [f"noise{i}" for i in range(300)]
    vals = spark.createDataFrame([(v,) for v in stream], "w string")
    sk = cms_sketch(vals, "w", depth=4, width=64)
    sk_py: dict[tuple[int, int], int] = {}
    for v in stream:
        for j in range(4):
            key = (j, _h(j, v, 64))
            sk_py[key] = sk_py.get(key, 0) + 1
    got_sk = {(r["row"], r["bucket"]): r["cnt"] for r in sk.collect()}
    assert got_sk == sk_py
    probes = spark.createDataFrame([("a",), ("b",), ("absent",)], "term string")
    est = {r["value"]: r["est"] for r in cms_estimate(sk, probes, width=64).collect()}
    for v, true in (("a", 50), ("b", 20), ("absent", 0)):
        expect = min(sk_py.get((j, _h(j, v, 64)), 0) for j in range(4))
        assert est[v] == expect
        assert est[v] >= true  # CMS never underestimates


def test_cms_merge_is_groupby_sum(spark):
    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 3, "w string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, "w string")
    both = a.union(b)
    merged = (
        cms_sketch(a, "w").union(cms_sketch(b, "w"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    direct = cms_sketch(both, "w")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


# ------------------------------------------------------------------- LTR
def test_ltr_features_exact_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "rank rank rank model", 40),
            (1, "rank model extra words here", 50),
            (2, "other content entirely here now", 60),
        ],
        "doc_id long, text string, n_chars long",
    )
    idx = build_index(docs, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    rows = {r["doc_id"]: r for r in ltr_features(s, docs, "rank", k=10).collect()}
    assert set(rows) == {0, 1}  # doc 2 doesn't match
    r0 = rows[0]
    assert (r0["tf"], r0["dl"], r0["df"], r0["n_chars"]) == (3, 4, 2, 40)
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    assert r0["idf_q6"] == math.floor(idf * 1e6 + 0.5)
    assert r0["tf_norm_q6"] == math.floor(3 / 4 * 1e6 + 0.5)
    # bm25 feature equals the searcher's own quantized score
    scored = {
        r["doc_id"]: math.floor(r["score"] * 1e4 + 0.5)
        for r in s.scored(TermQuery("rank")).collect()
    }
    for d, r in rows.items():
        assert r["bm25_q4"] == scored[d]
    # ranks follow (bm25 desc, doc asc)
    ordered = sorted(rows.values(), key=lambda r: r["rank"])
    keys = [(-r["bm25_q4"], r["doc_id"]) for r in ordered]
    assert keys == sorted(keys)


def test_ltr_k_cutoff(spark):
    docs = spark.createDataFrame(
        [(i, "common w" + str(i), 10) for i in range(30)],
        "doc_id long, text string, n_chars long",
    )
    s = IndexSearcher(build_index(docs, text_col="text", id_col="doc_id"), mode="double")
    assert ltr_features(s, docs, "common", k=7).count() == 7
