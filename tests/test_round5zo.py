"""Round-5 part-zo twins: accumulator-limited ranking and WIG/NQC QPP."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.accumulators import accumulator_limited_topk
from lucenenet_spark.search.quality import wig_nqc_qpp
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return idx, IndexSearcher(idx, mode="double")


CORPUS = [
    "rare common",            # d0
    "rare common common",     # d1
    "common filler words",    # d2
    "common common",          # d3
]


# ------------------------------------------------------------ accumulators
def test_accumulators_cap_spent_on_rarest_term(spark):
    _, s = _engine(spark, CORPUS)
    rows = accumulator_limited_topk(s, ["rare", "common"], limit=2, k=10).collect()
    assert {r["doc_id"] for r in rows} == {0, 1}
    assert all(r["first_term_rank"] == 1 for r in rows)


def test_accumulators_topup_picks_highest_new_contribution(spark):
    _, s = _engine(spark, CORPUS)
    rows = accumulator_limited_topk(s, ["rare", "common"], limit=3, k=10).collect()
    # round 1 admits d0,d1; the single remaining slot goes to the best
    # NEW 'common' doc — d3 (tf=2, len 2) outscores d2 (tf=1, len 3)
    assert {r["doc_id"] for r in rows} == {0, 1, 3}
    d3 = [r for r in rows if r["doc_id"] == 3][0]
    assert d3["first_term_rank"] == 2


def test_accumulators_unbounded_equals_full_or(spark):
    _, s = _engine(spark, CORPUS)
    rows = accumulator_limited_topk(s, ["rare", "common"], limit=100, k=10).collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 2, 3}
    # continue strategy: admitted docs carry their FULL OR score, so the
    # top of the unbounded run must equal the top of a binding run for
    # docs both admit
    capped = accumulator_limited_topk(s, ["rare", "common"], limit=2, k=10).collect()
    full = {r["doc_id"]: r["score_q"] for r in rows}
    for r in capped:
        assert full[r["doc_id"]] == r["score_q"]


def test_accumulators_admission_is_deterministic(spark):
    _, s = _engine(spark, CORPUS)
    a = [tuple(r) for r in accumulator_limited_topk(s, ["rare", "common"], limit=3, k=10).collect()]
    b = [tuple(r) for r in accumulator_limited_topk(s, ["rare", "common"], limit=3, k=10).collect()]
    assert a == b


def test_accumulators_validate_inputs(spark):
    _, s = _engine(spark, CORPUS)
    with pytest.raises(ValueError):
        accumulator_limited_topk(s, [], limit=3)
    with pytest.raises(ValueError):
        accumulator_limited_topk(s, ["x"], limit=0)
    with pytest.raises(ValueError):
        accumulator_limited_topk(s, ["x"], limit=3, k=0)


# -------------------------------------------------------------------- qpp
def _corpus_score_q4(idx, term):
    from lucenenet_spark.search.searcher import B, K1

    row = (
        idx.term_stats.filter(
            (idx.term_stats.field == idx.default_field)
            & (idx.term_stats.term == term)
        )
        .select("df", "ttf")
        .collect()[0]
    )
    n = float(idx.max_doc)
    idf = math.log(1.0 + (n - row["df"] + 0.5) / (row["df"] + 0.5))
    ctf = float(row["ttf"])
    sc = idf * (K1 + 1.0) * ctf / (ctf + K1 * ((1.0 - B) + B * n))
    return math.floor(sc * 10000.0 + 0.5)


def test_qpp_identical_scores_give_zero_variance(spark):
    idx, s = _engine(spark, ["probe x", "probe x", "probe x", "no match"])
    row = wig_nqc_qpp(s, "probe", k=10).collect()[0]
    assert row["k_eff"] == 3
    assert row["nqc_q6"] == 0  # all three scores identical
    assert row["s_corpus_q4"] == _corpus_score_q4(idx, "probe")


def test_qpp_python_replica(spark):
    texts = ["probe probe a", "probe b c d", "probe probe probe e", "f g", "probe h"]
    idx, s = _engine(spark, texts)
    row = wig_nqc_qpp(s, "probe", k=3).collect()[0]
    from pyspark.sql import functions as F

    from lucenenet_spark.search.queries import TermQuery

    scores = sorted(
        (
            r["q"]
            for r in s.scored(TermQuery("probe"))
            .select(F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
            .collect()
        ),
        reverse=True,
    )[:3]
    c = _corpus_score_q4(idx, "probe")
    k = len(scores)
    assert row["k_eff"] == k
    assert row["wig_sum_q4"] == sum(scores) - k * c
    var_num = k * sum(x * x for x in scores) - sum(scores) ** 2
    assert row["nqc_q6"] == math.floor(math.sqrt(var_num) / (k * c) * 1e6 + 0.5)


def test_qpp_high_contrast_query_scores_higher_nqc(spark):
    # 'spread' has wildly varying tf -> high NQC; 'flat' hits identical
    # docs only -> zero score variance -> NQC 0
    texts = [
        "spread spread spread spread a",
        "spread b c d e",
        "flat one two",
        "flat one two",
        "flat one two",
    ]
    _, s = _engine(spark, texts)
    hi = wig_nqc_qpp(s, "spread", k=2).collect()[0]["nqc_q6"]
    lo = wig_nqc_qpp(s, "flat", k=3).collect()[0]["nqc_q6"]
    assert hi > lo == 0
