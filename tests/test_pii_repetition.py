"""PII scrubbing + repetition quality signals (functions/pii.py,
functions/repetition.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.pii import scrub_pii
from lucenenet_spark.functions.repetition import repetition_filter, repetition_stats


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .appName("test-pii-repetition")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_scrub_pii_tags(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.co or 10.1.2.3 now"),
            (1, "ssn 123-45-6789 phone 555-867-5309 card 4111 1111 1111 1111"),
            (2, "clean text stays clean"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in scrub_pii(df).collect()}
    assert out[0] == "mail <EMAIL> or <IPV4> now"
    assert out[1] == "ssn <SSN> phone <PHONE> card <CARD>"
    assert out[2] == "clean text stays clean"


def test_scrub_pii_ssn_not_phone(spark):
    # SSN must win over the phone pattern on its own span
    df = spark.createDataFrame([(0, "id 123-45-6789 ok")], "doc_id long, text string")
    assert scrub_pii(df).collect()[0].text == "id <SSN> ok"


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (0, "a a a b"),          # top word a=3/4; top bigram 'a a'=2/3
            (1, "x y x y x"),        # top word x=3/5; top bigram 2/4
            (2, "solo"),             # 1 token, no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[0].n_tokens == 4 and rows[0].n_unique == 2
    assert rows[0].top_word_q == 7500 and rows[0].top_bigram_q == 6667
    assert rows[1].top_word_q == 6000 and rows[1].top_bigram_q == 5000
    assert rows[2].n_tokens == 1 and rows[2].top_bigram_q == 0


def test_repetition_stats_no_shuffle(spark):
    """The 100-TB property: per-row array arithmetic only — the physical
    plan must contain NO Exchange."""
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_filter(spark):
    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam spam spam spam spam spam spam"),
            (1, "the quick brown fox jumps over one lazy dog near a red barn"),
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in repetition_filter(df).collect()]
    assert kept == [1]


# ------------------------------------------------- URL canonicalization
def test_canonical_url_forms(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.urls import canonical_url_col

    cases = {
        "HTTP://WWW.Example.COM:80/Path/To//Page/#frag": "http://example.com/Path/To/Page",
        "https://example.com:443/a//b///c/": "https://example.com/a/b/c",
        "https://example.com/": "https://example.com",
        "https://example.com:8443/keep-port/": "https://example.com:8443/keep-port",
        "ftp://Host.Net//x//y": "ftp://host.net/x/y",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r.url: r.c
        for r in df.select("url", canonical_url_col(F.col("url")).alias("c")).collect()
    }
    assert got == cases


def test_dedup_by_canonical_url_first_crawl_wins(spark):
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.urls import dedup_by_canonical_url

    rows = [
        (0, "https://www.a.com/x/", "2026-01-01 00:00:02"),
        (1, "https://a.com/x", "2026-01-01 00:00:01"),
        (2, "https://a.com/y", "2026-01-01 00:00:03"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts string").withColumn(
        "warc_ts", F.to_timestamp("warc_ts")
    )
    assert sorted(r.doc_id for r in dedup_by_canonical_url(df).collect()) == [1, 2]


# ------------------------------------------------- unigram LM quality
def test_unigram_logprob_values(spark):
    from math import log

    from lucenenet_spark.functions.lm_quality import lm_quality_filter, unigram_logprob

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "c")], "doc_id long, text string"
    )
    # corpus counts: a=2, b=1, c=1, total=4
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    exp0 = (2 * log(2 / 4) + log(1 / 4)) / 3
    exp1 = log(1 / 4)
    assert rows[0].n_tokens == 3 and rows[1].n_tokens == 1
    import math
    assert rows[0].avg_logprob_q == math.floor(exp0 * 10000 + 0.5)
    assert rows[1].avg_logprob_q == math.floor(exp1 * 10000 + 0.5)
    # doc 1 (all-rare) scores lower and is filtered at a threshold between
    kept = [r.doc_id for r in lm_quality_filter(df, min_avg_logprob=exp0 - 1e-6).collect()]
    assert kept == [0]
