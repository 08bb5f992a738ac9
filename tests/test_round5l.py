"""Round-5l tests: SortedSetSelector middle selectors, JoinDocFreq
value source, cross-document duplicated-span detection."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.dedup import crossdoc_span_stats
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.sandbox import sorted_set_sort_field
from lucenenet_spark.search.valuesources import join_doc_freq


ROWS = [  # (doc, value) multivalued field: sets of size 1..4
    (0, "b"), (0, "d"), (0, "a"), (0, "c"),   # sorted {a,b,c,d}
    (1, "z"), (1, "m"), (1, "q"),             # sorted {m,q,z}
    (2, "k"),                                  # {k}
    (3, "y"), (3, "a"), (3, "a"),             # {a,y} (dup value collapses)
]
# SortedSetSelector 0-based picks over the sorted distinct sets
MIDDLE_MIN = {0: "b", 1: "q", 2: "k", 3: "a"}   # ord (n-1)//2
MIDDLE_MAX = {0: "c", 1: "q", 2: "k", 3: "y"}   # ord n//2
MINV = {0: "a", 1: "m", 2: "k", 3: "a"}
MAXV = {0: "d", 1: "z", 2: "k", 3: "y"}


@pytest.fixture(scope="module")
def dv(spark):
    return spark.createDataFrame(ROWS, "doc_id long, v string")


@pytest.mark.parametrize(
    "selector,expect",
    [("min", MINV), ("max", MAXV), ("middle_min", MIDDLE_MIN), ("middle_max", MIDDLE_MAX)],
)
def test_sorted_set_selectors_rowform(dv, selector, expect):
    got = {
        r["doc_id"]: r["sort_key"]
        for r in sorted_set_sort_field(dv, value_col="v", selector=selector, k=10).collect()
    }
    assert got == expect


@pytest.mark.parametrize(
    "selector,expect",
    [("min", MINV), ("max", MAXV), ("middle_min", MIDDLE_MIN), ("middle_max", MIDDLE_MAX)],
)
def test_sorted_set_selectors_arrayform(dv, spark, selector, expect):
    arr = dv.groupBy("doc_id").agg(F.collect_list("v").alias("v"))
    got = {
        r["doc_id"]: r["sort_key"]
        for r in sorted_set_sort_field(arr, value_col="v", selector=selector, k=10).collect()
    }
    assert got == expect


def test_sorted_set_order_and_k(dv):
    out = sorted_set_sort_field(dv, value_col="v", selector="middle_min", k=2).collect()
    assert [(r["doc_id"], r["sort_key"]) for r in out] == [(3, "a"), (0, "b")]


def test_sorted_set_bad_selector(dv):
    with pytest.raises(ValueError):
        sorted_set_sort_field(dv, value_col="v", selector="median")


DOCS = [
    (0, "apple pie apple tart"),
    (1, "apple banana"),
    (2, "banana banana split"),
    (3, "zzz unseen"),
]


def test_join_doc_freq_matches_brute(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id").cache()
    first = F.element_at(F.split(F.col("text"), " "), 1)
    got = {r["doc_id"]: r["value"] for r in join_doc_freq(docs, idx, first).collect()}
    # df(apple)=2 docs, df(banana)=2, df(zzz)=1
    assert got == {0: 2, 1: 2, 2: 2, 3: 1}


def test_join_doc_freq_absent_term_is_zero(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id").cache()
    got = {
        r["doc_id"]: r["value"]
        for r in join_doc_freq(docs, idx, F.lit("nosuchterm")).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


SPAN_DOCS = [
    # docs 0 and 1 share the 8-token run "a b c d e f g h" (doc 1 shifted)
    (0, "a b c d e f g h x y z"),
    (1, "p q a b c d e f g h"),
    (2, "one two three four five six seven"),          # 7 tokens -> no 8-grams
    (3, "u v w aa bb cc dd ee ff"),                    # unique grams only
]


def _py_span_stats(docs, n=8):
    grams = {}
    per_doc = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        gs = [
            hashlib.md5(" ".join(toks[i : i + n]).encode()).hexdigest()
            for i in range(len(toks) - n + 1)
        ]
        per_doc[doc_id] = gs
        for g in set(gs):
            grams.setdefault(g, set()).add(doc_id)
    out = {}
    for doc_id, gs in per_doc.items():
        dup = sum(1 for g in gs if len(grams[g]) > 1)
        out[doc_id] = (len(gs), dup)
    return out


def test_crossdoc_span_stats_matches_brute(spark):
    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_ngrams"], r["dup_ngrams"])
        for r in crossdoc_span_stats(docs, n=8).collect()
    }
    assert got == _py_span_stats(SPAN_DOCS, n=8)
    # the planted shared run is detected on both sides of the pair
    assert got[0][1] >= 1 and got[1][1] >= 1
    # the short doc yields zero grams, the unique doc zero dups
    assert got[2] == (0, 0)
    assert got[3][1] == 0


def test_crossdoc_span_stats_within_doc_repeat_not_dup(spark):
    # an n-gram repeated inside ONE doc is not a cross-doc duplicate
    rows = [(0, " ".join(["r"] * 20)), (1, "alpha beta gamma delta eps zeta eta theta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["total_ngrams"], r["dup_ngrams"])
        for r in crossdoc_span_stats(docs, n=8).collect()
    }
    assert got[0] == (13, 0)
    assert got[1] == (1, 0)


def test_norm_source_double_and_parity(spark):
    import math

    from lucenenet_spark.index.smallfloat import byte315_to_float, encode_norm
    from lucenenet_spark.search.valuesources import norm_source

    docs = spark.createDataFrame(
        # "a" is a stopword: doc 0 has dl=3, doc 1 dl=0 (empty after stops)
        [(0, "a b c d"), (1, "a"), (2, "x y z w v u t s q")],
        "doc_id long, text string",
    )
    idx = build_index(docs, text_col="text", id_col="doc_id").cache()
    dbl = {r["doc_id"]: r["value"] for r in norm_source(idx).collect()}
    assert dbl[0] == pytest.approx(1 / math.sqrt(3))
    assert dbl[1] == 0.0  # dl=0 -> documented neutral
    assert dbl[2] == pytest.approx(1 / math.sqrt(9))
    # parity mode reproduces the stored SmallFloat315 decode exactly
    import numpy as np

    par = {r["doc_id"]: r["value"] for r in norm_source(idx, mode="parity").collect()}
    for doc_id, dl in ((0, 3), (2, 9)):
        byte = int(encode_norm(np.array([dl]))[0])
        expect = float(byte315_to_float(np.array([byte], dtype=np.uint8))[0])
        assert par[doc_id] == pytest.approx(expect, rel=0)
        # the decode is the quantized 1/sqrt(dl), i.e. within SmallFloat's
        # one-significant-digit band of the exact value
        assert expect == pytest.approx(1 / math.sqrt(dl), rel=0.3)
    with pytest.raises(ValueError):
        norm_source(idx, mode="exact")


def test_classic_idf_formula():
    import math

    from lucenenet_spark.search.valuesources import classic_idf

    assert classic_idf(3, 100) == pytest.approx(math.log(100 / 4) + 1)
    assert classic_idf(0, 10) == pytest.approx(math.log(10) + 1)


def test_strip_duplicated_spans_matches_brute(spark):
    from lucenenet_spark.functions.dedup import strip_duplicated_spans

    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in strip_duplicated_spans(docs, n=8).collect()
    }
    # shared run "a b c d e f g h" stripped from both docs
    assert got[0] == "x y z"
    assert got[1] == "p q"
    # short doc and unique doc pass through unchanged
    assert got[2] == SPAN_DOCS[2][1]
    assert got[3] == SPAN_DOCS[3][1]


def test_strip_duplicated_spans_exact_dup_goes_empty(spark):
    from lucenenet_spark.functions.dedup import strip_duplicated_spans

    t = "alpha beta gamma delta eps zeta eta theta iota"
    docs = spark.createDataFrame([(0, t), (1, t)], "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in strip_duplicated_spans(docs, n=8).collect()
    }
    assert got == {0: "", 1: ""}


def test_strip_duplicated_spans_overlapping_coverage(spark):
    from lucenenet_spark.functions.dedup import strip_duplicated_spans

    # doc 1 contains TWO overlapping copies of doc 0's full 8-token run's
    # 9-token superset; coverage union must strip the whole overlap region
    run = "a b c d e f g h i"
    docs = spark.createDataFrame(
        [(0, run + " tailzero"), (1, "head " + run)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in strip_duplicated_spans(docs, n=8).collect()
    }
    # both 8-gram starts inside the 9-token run are duplicated -> all 9
    # tokens covered on each side; the unique flank tokens survive
    assert got[0] == "tailzero"
    assert got[1] == "head"


def _physical_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_crossdoc_ops_stay_jvm_side(spark):
    """The span ops must compile to pure whole-stage-codegen plans:
    no Python eval nodes (the gram pass is HOF Columns, not UDFs) and
    no cartesian product (the dup-gram match is a semi join)."""
    from lucenenet_spark.functions.dedup import (
        crossdoc_span_stats,
        strip_duplicated_spans,
    )

    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    for op in (crossdoc_span_stats, strip_duplicated_spans):
        plan = _physical_plan(op(docs, n=8))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
