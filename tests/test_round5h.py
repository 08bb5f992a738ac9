"""ValueSource family (recip/linear/scale + BoostedQuery) and GetTermInfo."""

import math

from pyspark.sql import functions as F

from lucenenet_spark.search.valuesources import (
    boosted_scores,
    linear,
    recip,
    scale_min_max,
)


def _vals(spark, rows):
    return spark.createDataFrame([(i, float(v)) for i, v in enumerate(rows)], "doc_id long, x double")


def test_recip_linear_math(spark):
    df = _vals(spark, [0.0, 1.0, 4.0]).select(
        "doc_id",
        recip(F.col("x"), m=2.0, a=1.5, b=0.5).alias("r"),
        linear(F.col("x"), slope=3.0, intercept=-1.0).alias("l"),
    )
    got = {r["doc_id"]: (r["r"], r["l"]) for r in df.collect()}
    for i, x in enumerate([0.0, 1.0, 4.0]):
        assert math.isclose(got[i][0], 1.5 / (2.0 * x + 0.5))
        assert math.isclose(got[i][1], 3.0 * x - 1.0)


def test_scale_min_max_endpoints_and_range(spark):
    df = scale_min_max(_vals(spark, [10, 30, 20, 25]), "x", tmin=0.0, tmax=1.0)
    got = {r["doc_id"]: r["scaled"] for r in df.collect()}
    assert got[0] == 0.0  # corpus min -> tmin
    assert got[1] == 1.0  # corpus max -> tmax
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert math.isclose(got[2], 0.5)


def test_scale_degenerate_all_equal_maps_to_tmin(spark):
    # ScaleFloatFunction's scale=0 branch: max == min -> every doc at tmin.
    df = scale_min_max(_vals(spark, [7, 7, 7]), "x", tmin=0.25, tmax=0.75)
    assert {r["scaled"] for r in df.collect()} == {0.25}


def test_boosted_scores_is_per_doc_multiply(spark):
    scored = spark.createDataFrame(
        [(0, 2.0), (1, 3.0), (2, 5.0)], "doc_id long, score double"
    )
    vals = spark.createDataFrame(
        [(0, 0.5), (1, 2.0), (2, 0.0)], "doc_id long, vs double"
    )
    got = {r["doc_id"]: r["score"] for r in boosted_scores(scored, vals, "vs").collect()}
    assert got == {0: 1.0, 1: 6.0, 2: 0.0}


def test_term_info_matches_postings(spark, tmp_path):
    from tests.conftest import make_corpus
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.misc import term_info

    docs = make_corpus(120)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    idx = build_index(df)
    # pick a mid-frequency term from the stats themselves
    row = idx.term_stats.orderBy(F.desc("df"), F.asc("term")).limit(3).collect()[-1]
    info = term_info(idx, row["term"]).collect()
    assert len(info) == 1
    got = info[0]
    post = idx.postings.filter(F.col("term") == row["term"])
    assert got["df"] == post.select("doc_id").distinct().count()
    assert got["ttf"] == post.agg(F.sum("tf")).collect()[0][0]
    # absent term -> empty frame, not an error (GetTermInfo prints nothing)
    assert term_info(idx, "zz_no_such_term_zz").count() == 0
