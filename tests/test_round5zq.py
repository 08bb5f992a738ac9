"""Round-5 part-zq twins: pivoted-normalization VSM and DFI ranking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.similarities import dfi_scored, pivoted_norm_scored


def _idx(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def _q4(df):
    return {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q")
        ).collect()
    }


# ----------------------------------------------------------------- pivoted
def test_pivoted_hand_computed(spark):
    idx = _idx(spark, ["probe probe probe filler", "probe x", "y z"])
    got = _q4(pivoted_norm_scored(idx, "probe", slope=0.2))
    n, df = 3.0, 2.0
    sttf = 8  # 4 + 2 + 2 tokens survive (no stop words here)
    avgdl = sttf / n
    idf = math.log((n + 1.0) / df)

    def sc(tf, dl):
        return math.floor(
            (1.0 + math.log(1.0 + math.log(tf)))
            / ((0.8) + 0.2 * dl / avgdl)
            * idf
            * 1e4
            + 0.5
        )

    assert got == {0: sc(3, 4), 1: sc(1, 2)}


def test_pivoted_tf1_weight_is_one(spark):
    # tf=1: 1 + ln(1 + ln 1) = 1 — only idf and the pivot act
    idx = _idx(spark, ["probe x", "probe y"])
    got = _q4(pivoted_norm_scored(idx, "probe"))
    assert got[0] == got[1]  # identical dl and tf
    n, df = 2.0, 2.0
    want = math.floor(1.0 / 1.0 * math.log((n + 1.0) / df) * 1e4 + 0.5)
    assert got[0] == want  # dl == avgdl -> normalizer exactly 1


def test_pivoted_slope_zero_ignores_length(spark):
    idx = _idx(spark, ["probe " + "pad " * 20, "probe x"])
    got = _q4(pivoted_norm_scored(idx, "probe", slope=0.0))
    assert got[0] == got[1]


# --------------------------------------------------------------------- dfi
def test_dfi_drops_at_or_below_chance(spark):
    # 'common' appears once in every doc: tf == 1 vs expected close to
    # dl * (ttf+1)/(sttf+1); craft so tf <= e for the long doc only
    idx = _idx(spark, ["common " + "pad " * 30, "common x"])
    got = _q4(dfi_scored(idx, "common"))
    # long doc: e = 3 * 31/35ish > 1 -> dropped; short doc: e = 3*2/35 < 1 -> kept
    assert 0 not in got and 1 in got


def test_dfi_hand_computed(spark):
    idx = _idx(spark, ["probe probe probe x", "y z probe w"])
    got = _q4(dfi_scored(idx, "probe"))
    sttf = 8.0
    ttf = 4.0
    def e(dl):
        return (ttf + 1.0) * dl / (sttf + 1.0)
    def sc(tf, dl):
        m = (tf - e(dl)) / math.sqrt(e(dl))
        return math.floor(math.log(m + 1.0) / math.log(2.0) * 1e4 + 0.5)
    # doc0: tf 3 > e(4)=2.22 kept; doc1: tf 1 < e(4)=2.22 dropped
    assert got == {0: sc(3, 4)}


def test_dfi_monotone_in_tf_for_fixed_length(spark):
    texts = [
        "probe " * 6 + "x1 x2",          # tf 6, dl 8
        "probe " * 5 + "x1 x2 x3",       # tf 5, dl 8
        "probe " + "x1 x2 x3 x4 x5 x6 x7",  # tf 1, dl 8 (below chance)
    ]
    idx = _idx(spark, texts)
    got = _q4(dfi_scored(idx, "probe"))
    # e = 13*8/25 = 4.16: docs 0 and 1 beat chance, doc 2 is dropped
    assert set(got) == {0, 1}
    assert got[0] > got[1]
