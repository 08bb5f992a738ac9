"""Round-5 part-w twins: ERR@k, Kendall tau, bpref."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import bpref_at_k, err_at_k, kendall_tau
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _mk_index(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return build_index(docs, text_col="text", id_col="doc_id")


def _py_err(run_grades: list[int], gmax: int = 4) -> int:
    """Quantized-contribution replica of err_at_k for a ranked grade list."""
    p = 1  # Π (16 - n_i)
    q = 1  # 16^rank
    s = 0
    for r, g in enumerate(run_grades, start=1):
        n = 2 ** min(g, gmax) - 1
        q *= 16
        s += math.floor(n * p / (r * q) * 1e9 + 0.5)
        p *= 16 - n
    return s


# -------------------------------------------------------------------- ERR
def test_err_matches_python_replica(spark):
    # tf(alpha) per doc: 4, 2, 1, 3, 1 — BM25 ranks high-tf docs first,
    # but dl also varies; derive the expected grade order from the engine
    texts = [
        "alpha alpha alpha alpha pad",
        "alpha alpha filler words here",
        "alpha one two three four five",
        "alpha alpha alpha end",
        "alpha lone",
    ]
    idx = _mk_index(spark, texts)
    s = IndexSearcher(idx, mode="double")
    ranked = (
        s.scored(TermQuery("alpha"))
        .select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .collect()
    )
    tf = {0: 4, 1: 2, 2: 1, 3: 3, 4: 1}
    grades = [min(tf[r["doc_id"]], 4) for r in ranked]
    got = err_at_k(s, "alpha", k=10).collect()[0]
    assert got["k"] == 10
    assert got["err_q9"] == _py_err(grades)


def test_err_perfect_first_hit_dominates(spark):
    # one grade-4 doc: ERR >= R_1 = 15/16; adding later docs adds little
    idx = _mk_index(spark, ["best best best best best", "meh best"])
    s = IndexSearcher(idx, mode="double")
    err = err_at_k(s, "best", k=10).collect()[0]["err_q9"]
    assert err >= math.floor(15 / 16 * 1e9)
    assert err <= 1_000_000_000  # ERR is a probability-weighted RR <= 1


# -------------------------------------------------------------- Kendall tau
def _mk_ranking(spark, ids):
    return spark.createDataFrame(
        [(d, r + 1) for r, d in enumerate(ids)], "doc_id long, rank long"
    )


def test_tau_identical_reversed_partial(spark):
    a = _mk_ranking(spark, [1, 2, 3, 4, 5])
    same = kendall_tau(a, _mk_ranking(spark, [1, 2, 3, 4, 5])).collect()[0]
    assert (same["n_common"], same["tau_q6"]) == (5, 1_000_000)
    rev = kendall_tau(a, _mk_ranking(spark, [5, 4, 3, 2, 1])).collect()[0]
    assert rev["tau_q6"] == -1_000_000
    assert rev["concordant"] == 0 and rev["discordant"] == 10
    # one adjacent swap: C=9, D=1, tau = 0.8
    part = kendall_tau(a, _mk_ranking(spark, [2, 1, 3, 4, 5])).collect()[0]
    assert (part["concordant"], part["discordant"], part["tau_q6"]) == (9, 1, 800_000)


def test_tau_disjoint_lists_is_zero(spark):
    a = _mk_ranking(spark, [1, 2, 3])
    b = _mk_ranking(spark, [7, 8, 9])
    row = kendall_tau(a, b).collect()[0]
    assert (row["n_common"], row["concordant"], row["discordant"], row["tau_q6"]) == (
        0,
        0,
        0,
        0,
    )


def test_tau_respects_k_cutoff(spark):
    a = _mk_ranking(spark, list(range(1, 21)))
    b = _mk_ranking(spark, list(range(1, 21)))
    assert kendall_tau(a, b, k=10).collect()[0]["n_common"] == 10


# ------------------------------------------------------------------- bpref
def test_bpref_perfect_separation_is_one(spark):
    # rel docs (tf>=2) all outrank the single nonrel (tf==1) doc
    texts = ["rock rock rock", "rock rock", "rock solo filler pad"]
    s = IndexSearcher(_mk_index(spark, texts), mode="double")
    row = bpref_at_k(s, "rock", k=10, min_tf=2).collect()[0]
    assert (row["r_total"], row["n_total"]) == (2, 1)
    assert row["bpref_q9"] == 1_000_000_000


def test_bpref_counts_nonrel_above(spark):
    # Make the nonrel doc rank FIRST: tf=1 but tiny dl beats tf=2 with
    # huge dl? BM25 saturates tf, so use dl contrast: doc0 tf=1 dl=1,
    # others tf=2 dl long.
    texts = [
        "jazz",
        "jazz jazz " + "pad " * 20,
        "jazz jazz " + "fill " * 20,
    ]
    s = IndexSearcher(_mk_index(spark, texts), mode="double")
    ranked = [
        r["doc_id"]
        for r in s.search(TermQuery("jazz"), 3).collect()
    ]
    assert ranked[0] == 0  # the nonrel doc really is on top
    row = bpref_at_k(s, "jazz", k=10, min_tf=2).collect()[0]
    # R=2, N=1: each rel doc has 1 nonrel above, capped min(1, R)=1;
    # contribution 1 - 1/min(R,N)=1 -> 0 each; bpref = 0
    assert (row["r_total"], row["n_total"], row["bpref_q9"]) == (2, 1, 0)


def test_bpref_mixed_matches_python_replica(spark):
    # tf pattern 3,1,2,1,2: R=3 rel (docs 0,2,4), N=2 nonrel (docs 1,3);
    # the expectation replays the engine's OWN ranking, so the test pins
    # the bpref arithmetic, not a hand-tuned BM25 order
    texts = [
        "funk funk funk",
        "funk x",
        "funk funk y z",
        "funk a b c d",
        "funk funk p q r s t u",
    ]
    rel = {0: True, 1: False, 2: True, 3: False, 4: True}
    s = IndexSearcher(_mk_index(spark, texts), mode="double")
    ranked = [r["doc_id"] for r in s.search(TermQuery("funk"), 5).collect()]
    r_total = sum(rel.values())
    n_total = len(rel) - r_total
    expect, nonrel_above = 0, 0
    for d in ranked:
        if rel[d]:
            c = 1.0 - min(nonrel_above, r_total) / min(r_total, n_total)
            expect += math.floor(c * 1e9 + 0.5)
        else:
            nonrel_above += 1
    expect_q9 = math.floor(expect / r_total + 0.5)
    row = bpref_at_k(s, "funk", k=10, min_tf=2).collect()[0]
    assert (row["r_total"], row["n_total"]) == (r_total, n_total)
    assert row["bpref_q9"] == expect_q9
    assert 0 < row["bpref_q9"] < 1_000_000_000  # genuinely mixed ranking
