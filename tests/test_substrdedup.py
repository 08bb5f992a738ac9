"""ExactSubstr span-dedup invariants (functions/substrdedup.py)."""

import pytest
from pyspark.sql import SparkSession

from lucenenet_spark.functions.substrdedup import (
    duplicated_span_losers,
    positional_grams,
    remove_duplicate_spans,
)

SPAN = "a b c d e"  # 5 tokens — tests run at n=5


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_keeps_first_occurrence(spark):
    docs = _docs(
        spark,
        [
            (0, f"x y {SPAN} z"),
            (1, f"p q r {SPAN} s t"),
            (2, "u v w only unique words here"),
        ],
    )
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=5).collect()}
    assert out[0]["text_clean"] == f"x y {SPAN} z" and out[0]["removed"] == 0
    assert out[1]["text_clean"] == "p q r s t" and out[1]["removed"] == 5
    assert out[2]["removed"] == 0


def test_within_doc_repeat_is_cut(spark):
    docs = _docs(spark, [(0, f"{SPAN} mid1 mid2 {SPAN}")])
    out = remove_duplicate_spans(docs, n=5).collect()[0]
    assert out["text_clean"] == f"{SPAN} mid1 mid2"
    assert out["removed"] == 5


def test_short_docs_pass_through(spark):
    docs = _docs(spark, [(0, "one two"), (1, "one two")])
    # both shorter than n -> no grams -> nothing removed even though equal
    for r in remove_duplicate_spans(docs, n=5).collect():
        assert r["text_clean"] == "one two" and r["removed"] == 0


def test_overlapping_dup_grams_union_coverage(spark):
    # a 6-token duplicated span at n=5 = two overlapping dup 5-grams;
    # coverage must be their union (6 tokens), not 10
    span6 = "a b c d e f"
    docs = _docs(spark, [(0, f"{span6} tail0"), (1, f"head1 {span6}")])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, n=5).collect()}
    assert out[0]["removed"] == 0
    assert out[1]["text_clean"] == "head1" and out[1]["removed"] == 6


def test_losers_exclude_corpus_first(spark):
    docs = _docs(spark, [(3, SPAN), (7, SPAN), (9, SPAN)])
    losers = duplicated_span_losers(positional_grams(docs, 5)).collect()
    assert sorted((r["doc_id"], r["start"]) for r in losers) == [(7, 0), (9, 0)]
