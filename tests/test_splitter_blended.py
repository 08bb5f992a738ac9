"""MultiPassIndexSplitter + BlendedInfixSuggester regression tests."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .appName("test-splitter-blended")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def idx(spark):
    from lucenenet_spark import build_index

    docs = spark.createDataFrame(
        [(i, f"word{i % 3} common filler{i}") for i in range(10)],
        "doc_id long, text string",
    )
    return build_index(docs)


def test_split_round_robin_partitions(idx):
    from lucenenet_spark import IndexSearcher, TermQuery
    from lucenenet_spark.index.splitter import split_index

    shards = [split_index(idx, 3, i) for i in range(3)]
    assert sum(s.max_doc for s in shards) == idx.max_doc
    total = sum(IndexSearcher(s).count(TermQuery("common")) for s in shards)
    assert total == IndexSearcher(idx).count(TermQuery("common")) == 10
    # per-shard stats are LOCAL: df of 'common' in shard0 == shard0's docs
    df0 = (
        shards[0].term_stats.filter("term = 'common'").collect()[0]["df"]
    )
    assert df0 == shards[0].max_doc


def test_split_seq_ranges(idx):
    from lucenenet_spark.index.splitter import split_index

    s0 = split_index(idx, 2, 0, seq=True)
    ids = {r.doc_id for r in s0.doclens.select("doc_id").collect()}
    assert ids == set(range(5))  # contiguous low range


def test_split_validates_shard(idx):
    from lucenenet_spark.index.splitter import split_index

    with pytest.raises(ValueError):
        split_index(idx, 2, 2)


def test_blended_linear_and_reciprocal(spark):
    from lucenenet_spark.search.suggest import BlendedInfixSuggester

    ent = spark.createDataFrame(
        [("key first", 10), ("scan key", 10), ("one two key", 10)],
        "surface string, weight long",
    )
    lin = {r.surface: r.score for r in BlendedInfixSuggester(ent).lookup("key").collect()}
    assert lin == {"key first": 10, "scan key": 9, "one two key": 8}
    rec = {
        r.surface: r.score
        for r in BlendedInfixSuggester(ent, blender="reciprocal").lookup("key").collect()
    }
    assert rec == {"key first": 10, "scan key": 5, "one two key": 3}


def test_blended_rejects_unknown_blender(spark):
    from lucenenet_spark.search.suggest import BlendedInfixSuggester

    ent = spark.createDataFrame([("a", 1)], "surface string, weight long")
    with pytest.raises(ValueError):
        BlendedInfixSuggester(ent, blender="geometric")
