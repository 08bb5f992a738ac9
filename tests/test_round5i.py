"""ValueSource DSL completion (arithmetic/rangemap/if/stat sources,
QueryValueSource, FunctionQuery) and the reciprocal infix blender."""

import math

from pyspark.sql import functions as F

from lucenenet_spark.search.valuesources import (
    const,
    div_vs,
    function_query,
    if_vs,
    max_vs,
    min_vs,
    pow_vs,
    product_vs,
    query_value_source,
    range_map,
    sum_vs,
)


def _vals(spark, rows):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(rows)], "doc_id long, x double"
    )


def test_arithmetic_sources_compose(spark):
    x = F.col("x")
    df = _vals(spark, [2.0, 3.0]).select(
        "doc_id",
        sum_vs(x, const(1.0), x).alias("s"),
        product_vs(x, x, const(2.0)).alias("p"),
        max_vs(x, const(2.5)).alias("mx"),
        min_vs(x, const(2.5)).alias("mn"),
        div_vs(pow_vs(x, const(2.0)), const(4.0)).alias("dp"),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got[0]["s"] == 5.0 and got[1]["s"] == 7.0
    assert got[0]["p"] == 8.0 and got[1]["p"] == 18.0
    assert got[0]["mx"] == 2.5 and got[1]["mx"] == 3.0
    assert got[0]["mn"] == 2.0 and got[1]["mn"] == 2.5
    assert got[0]["dp"] == 1.0 and got[1]["dp"] == 2.25


def test_range_map_and_if(spark):
    df = _vals(spark, [100.0, 250.0, 401.0]).select(
        "doc_id",
        range_map(F.col("x"), 200, 400, 2.0, 0.5).alias("rm"),
        range_map(F.col("x"), 200, 400, 2.0).alias("rm_id"),  # null default -> x
        if_vs(F.col("x") > 200, const(1.0), const(-1.0)).alias("iv"),
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert [got[i]["rm"] for i in range(3)] == [0.5, 2.0, 0.5]
    assert [got[i]["rm_id"] for i in range(3)] == [100.0, 2.0, 401.0]
    assert [got[i]["iv"] for i in range(3)] == [-1.0, 1.0, 1.0]


def test_function_query_matches_all_docs(spark):
    docs = _vals(spark, [10.0, 20.0, 30.0])
    out = function_query(docs, F.col("x") * const(0.5)).collect()
    assert {r["doc_id"]: r["score"] for r in out} == {0: 5.0, 1: 10.0, 2: 15.0}


def test_query_value_source_default_fills_misses(spark):
    docs = _vals(spark, [0.0, 0.0, 0.0, 0.0])
    scored = spark.createDataFrame([(1, 3.5), (3, 1.5)], "doc_id long, score double")
    got = {
        r["doc_id"]: r["value"]
        for r in query_value_source(docs, scored, default=0.25).collect()
    }
    assert got == {0: 0.25, 1: 3.5, 2: 0.25, 3: 1.5}


def test_stat_sources_match_brute_force(spark):
    from tests.conftest import make_corpus
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.valuesources import (
        doc_freq,
        max_doc,
        num_docs,
        sum_total_term_freq,
        term_freq_source,
        tf_source,
        total_term_freq,
    )

    docs = make_corpus(80)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    idx = build_index(df)
    term = idx.term_stats.orderBy(F.desc("df"), F.asc("term")).limit(1).collect()[0][
        "term"
    ]
    post = idx.postings.filter(F.col("term") == term)
    assert doc_freq(idx, term) == post.select("doc_id").distinct().count()
    assert total_term_freq(idx, term) == post.agg(F.sum("tf")).collect()[0][0]
    assert max_doc(idx) == 80.0 and num_docs(idx) == 80.0
    assert sum_total_term_freq(idx) == idx.sum_ttf
    raw = {r["doc_id"]: r["tf"] for r in term_freq_source(idx, term).collect()}
    shaped = {r["doc_id"]: r["tf"] for r in tf_source(idx, term).collect()}
    assert raw and all(math.isclose(shaped[d], math.sqrt(v)) for d, v in raw.items())
    assert doc_freq(idx, "zz_absent_zz") == 0.0


def test_blended_reciprocal_beats_linear_decay(spark):
    from lucenenet_spark.search.suggest import BlendedInfixSuggester

    ent = spark.createDataFrame(
        [("keystone arch", 100), ("the keystone", 100), ("stone keystone wall", 100)],
        "surface string, weight long",
    )
    rec = {
        r["surface"]: r["score"]
        for r in BlendedInfixSuggester(ent, blender="reciprocal").lookup("key", 5).collect()
    }
    # pos 0 -> coef 1; pos 1 -> 1/2 (reciprocal) vs 0.9 (linear)
    assert rec["keystone arch"] == 100
    # "the" is a stopword: compacted token list puts keystone at pos 0
    assert rec["the keystone"] == 100
    assert rec["stone keystone wall"] == 50
    lin = {
        r["surface"]: r["score"]
        for r in BlendedInfixSuggester(ent, blender="linear").lookup("key", 5).collect()
    }
    assert lin["stone keystone wall"] == 90
