"""Round-5 part-y twins: interleave credit, recrawl rates,
registrable-domain extraction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.crawl import recrawl_rates
from lucenenet_spark.functions.urls import registrable_domain_col
from lucenenet_spark.search.interleave import interleave_credit


def _page(spark, rows):
    return spark.createDataFrame(rows, "pos long, doc_id long, team string")


def _clicks(spark, ids):
    return spark.createDataFrame([(d,) for d in ids], "doc_id long")


# ---------------------------------------------------------------- credit
def test_credit_counts_and_winner(spark):
    page = _page(
        spark,
        [(1, 10, "A"), (2, 20, "B"), (3, 11, "A"), (4, 21, "B"), (5, 12, "A")],
    )
    row = interleave_credit(page, _clicks(spark, [10, 11, 21])).collect()[0]
    assert (row["clicks_a"], row["clicks_b"], row["winner"]) == (2, 1, "A")


def test_credit_ignores_offpage_clicks_and_ties(spark):
    page = _page(spark, [(1, 1, "A"), (2, 2, "B")])
    row = interleave_credit(page, _clicks(spark, [1, 2, 999])).collect()[0]
    assert (row["clicks_a"], row["clicks_b"], row["winner"]) == (1, 1, "tie")
    row0 = interleave_credit(page, _clicks(spark, [999])).collect()[0]
    assert (row0["clicks_a"], row0["clicks_b"], row0["winner"]) == (0, 0, "tie")


def test_credit_duplicate_clicks_count_once(spark):
    page = _page(spark, [(1, 5, "B")])
    row = interleave_credit(page, _clicks(spark, [5, 5, 5])).collect()[0]
    assert (row["clicks_a"], row["clicks_b"], row["winner"]) == (0, 1, "B")


# ---------------------------------------------------------------- recrawl
def test_recrawl_lambda_matches_published_estimator(spark):
    docs = spark.createDataFrame([(i,) for i in range(18)], "doc_id long")
    obs = 8
    rows = recrawl_rates(docs, obs=obs, top=100).collect()
    for r in rows:
        lam = -math.log((obs - r["changes"] + 0.5) / (obs + 0.5))
        assert r["lambda_q6"] == math.floor(lam * 1e6 + 0.5)
        assert r["obs"] == obs
    # monotone: more observed changes -> higher estimated rate
    by_changes = sorted(rows, key=lambda r: r["changes"])
    lams = [r["lambda_q6"] for r in by_changes]
    assert lams == sorted(lams)


def test_recrawl_ordering_and_top(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    rows = recrawl_rates(docs, obs=8, top=7).collect()
    assert len(rows) == 7
    # 50 docs, changes = doc_id % 9: five docs saw 8/8 changes, so the
    # head is those five (doc_id ascending), then the 7/8-change docs
    assert [(r["doc_id"], r["changes"]) for r in rows] == [
        (8, 8), (17, 8), (26, 8), (35, 8), (44, 8), (7, 7), (16, 7),
    ]


# ---------------------------------------------------- registrable domain
def test_registrable_longest_suffix_wins(spark):
    suffixes = ["com", "co.uk", "uk", "org"]
    hosts = [
        ("a.example.com", "example.com"),
        ("deep.sub.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("only.uk", "only.uk"),  # matches 'uk', not 'co.uk'
        ("co.uk", None),  # the suffix itself: no registrable domain
        ("x.cluster.internal", "cluster.internal"),  # PSL '*' fallback
        ("localhost", None),  # single label
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    got = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registrable_domain_col(F.col("host"), suffixes).alias("rd")
        ).collect()
    }
    for h, want in hosts:
        assert got[h] == want, h


def test_registrable_groups_sites_not_subdomains(spark):
    suffixes = ["co.uk", "uk"]
    df = spark.createDataFrame(
        [("a.shop.co.uk",), ("b.shop.co.uk",), ("shop.co.uk",), ("mall.co.uk",)],
        "host string",
    )
    rd = df.select(registrable_domain_col(F.col("host"), suffixes).alias("rd"))
    counts = {r["rd"]: r["n"] for r in rd.groupBy("rd").agg(F.count("*").alias("n")).collect()}
    assert counts == {"shop.co.uk": 3, "mall.co.uk": 1}
