"""Round-5 part-zf twins: RAKE keyphrases and the LSH quality audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.dedup import lsh_quality_audit
from lucenenet_spark.functions.textstats import rake_keyphrases


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ------------------------------------------------------------------- RAKE
def test_rake_hand_computed_scores(spark):
    # runs split on the stopword 'the'; phrases: "deep learning",
    # "deep learning systems", "linear algebra"
    texts = [
        "deep learning the linear algebra",
        "deep learning systems the linear algebra",
    ]
    rows = {r["phrase"]: r for r in rake_keyphrases(_docs(spark, texts), k=50).collect()}
    assert set(rows) == {"deep learning", "deep learning systems", "linear algebra"}
    # word stats: deep: freq2 deg(2+3)=5; learning: freq2 deg5;
    # systems: freq1 deg3; linear: freq2 deg4; algebra: freq2 deg4
    ws = {
        "deep": 5 / 2, "learning": 5 / 2, "systems": 3 / 1,
        "linear": 4 / 2, "algebra": 4 / 2,
    }
    q = lambda x: math.floor(x * 1e6 + 0.5)
    assert rows["deep learning"]["score_q"] == q(ws["deep"]) + q(ws["learning"])
    assert rows["deep learning systems"]["score_q"] == (
        q(ws["deep"]) + q(ws["learning"]) + q(ws["systems"])
    )
    assert rows["linear algebra"]["score_q"] == q(ws["linear"]) + q(ws["algebra"])
    assert rows["linear algebra"]["n_occurrences"] == 2
    # the 3-word phrase outscores its 2-word prefix (longer runs win)
    assert rows["deep learning systems"]["score_q"] > rows["deep learning"]["score_q"]


def test_rake_discards_overlong_runs_and_counts_repeats(spark):
    texts = ["one two three four five six the short run"]
    rows = {r["phrase"] for r in rake_keyphrases(_docs(spark, texts), max_words=4, k=50).collect()}
    assert rows == {"short run"}  # 6-word run dropped by the length filter


def test_rake_repeated_word_in_phrase_counts_twice(spark):
    rows = rake_keyphrases(_docs(spark, ["echo echo the other"]), k=10).collect()
    byp = {r["phrase"]: r for r in rows}
    # 'echo echo': freq(echo)=2, deg(echo)=4 -> ws 2.0; score = 2 words * 2e6
    assert byp["echo echo"]["score_q"] == 4_000_000


# ------------------------------------------------------------------- audit
def test_lsh_audit_perfect_on_exact_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [base, base, "totally different words " + "x y z w " * 3]
    row = lsh_quality_audit(_docs(spark, texts)).collect()[0]
    # identical docs share all shingles: truth = {(0,1)}; LSH must find it
    assert row["n_truth"] == 1 and row["tp"] == 1
    assert row["recall_ppm"] == 1_000_000
    assert row["n_cand"] >= 1
    assert 0 < row["precision_ppm"] <= 1_000_000


def test_lsh_audit_no_dups_no_truth(spark):
    texts = [f"unique{i} text{i} body{i} words{i} here{i}" for i in range(6)]
    row = lsh_quality_audit(_docs(spark, texts)).collect()[0]
    assert row["n_truth"] == 0 and row["tp"] == 0
    assert row["recall_ppm"] == 0  # guarded division


def test_lsh_audit_metrics_are_consistent(spark):
    texts = ["shared phrase block one two three four five " + f"tail{i}" for i in range(5)]
    row = lsh_quality_audit(_docs(spark, texts)).collect()[0]
    assert row["tp"] <= min(row["n_truth"], row["n_cand"])
    if row["n_cand"]:
        assert row["precision_ppm"] == row["tp"] * 1_000_000 // row["n_cand"]
    if row["n_truth"]:
        assert row["recall_ppm"] == row["tp"] * 1_000_000 // row["n_truth"]
