"""Round-5f tests: Benchmark Quality package (QualityStats/TrecJudge) and
Classification.Utils DatasetSplitter."""

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.datasets import (
    dataset_split,
    dataset_split_sequential,
)
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import (
    MAX_POINTS,
    quality_benchmark,
    trec_judgments,
)
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def engine(spark, corpus_df):
    idx = build_index(corpus_df, text_col="text", id_col="doc_id").cache()
    return idx, IndexSearcher(idx, mode="double")


# ---------------------------------------------------------------------------
# QualityStats parity: pure-Python transliteration of AddResult/GetAvp
# (QualityStats.cs:86-141) vs the DataFrame aggregation
# ---------------------------------------------------------------------------
def _quality_stats_sequential(ranked_rel: list, max_good: int) -> dict:
    """Transliterate QualityStats.AddResult + accessors."""
    num_points = 0
    num_good = 0
    p_relevant_sum = 0.0
    mrr = 0.0
    p_at = {}
    for n, rel in enumerate(ranked_rel, start=1):
        if rel:
            num_good += 1
            if num_good == 1 and n <= 5:
                mrr = 1.0 / n
        num_points = n
        p = num_good / num_points
        if rel:
            p_relevant_sum += p
        p_at[n] = p

    def precision_at(n):
        if n > num_points:
            return (num_points * p_at[num_points]) / n if num_points else 0.0
        return p_at[n]

    avp = 0.0 if max_good == 0 else p_relevant_sum / max_good
    recall = (
        num_good / max_good
        if max_good > 0
        else (p_at[num_points] if num_points else 0.0)
    )
    return {
        "num_points": num_points,
        "num_good": num_good,
        "p5": precision_at(5),
        "p10": precision_at(10),
        "mrr": mrr,
        "avp": avp,
        "recall": recall,
    }


def _q(x: float) -> int:
    return int(math.floor(x * 10000 + 0.5))


def test_quality_benchmark_matches_sequential_reference(spark, engine):
    idx, searcher = engine
    terms = ["w0000", "w0001", "w0002"]
    out = {
        r["query"]: r
        for r in quality_benchmark(searcher, terms, k=20, min_tf=2).collect()
    }
    judg = trec_judgments(idx, terms, min_tf=2)
    judged = {
        t: {r["doc_id"] for r in judg.filter(F.col("query") == t).collect()}
        for t in terms
    }
    for t in terms:
        # independent ranked list: quantized score desc, doc_id asc
        hits = (
            searcher.scored(TermQuery(t))
            .select(
                "doc_id",
                F.floor(F.col("score") * 10000.0 + 0.5)
                .cast("long")
                .alias("sq"),
            )
            .collect()
        )
        hits.sort(key=lambda r: (-r["sq"], r["doc_id"]))
        ranked_rel = [h["doc_id"] in judged[t] for h in hits[:20]]
        exp = _quality_stats_sequential(ranked_rel, len(judged[t]))
        got = out[t]
        assert got["num_points"] == exp["num_points"], t
        assert got["num_good"] == exp["num_good"], t
        assert got["max_good"] == len(judged[t]), t
        assert got["p5_q"] == _q(exp["p5"]), t
        assert got["p10_q"] == _q(exp["p10"]), t
        assert got["mrr_q"] == _q(exp["mrr"]), t
        assert got["avp_q"] == _q(exp["avp"]), t
        assert got["recall_q"] == _q(exp["recall"]), t


def test_quality_short_result_list_degrades_precision(spark, engine):
    """A query with fewer than 10 hits: P@10 follows GetPrecisionAt's
    numPoints*pAt[numPoints]/n = numGood/10 degradation."""
    idx, searcher = engine
    # find a rare term with 1 <= df < 10
    rare = (
        idx.term_stats.filter((F.col("df") >= 1) & (F.col("df") < 10))
        .orderBy("term")
        .limit(1)
        .collect()
    )
    if not rare:
        pytest.skip("no rare term in corpus")
    t = rare[0]["term"]
    row = quality_benchmark(searcher, [t], k=20, min_tf=1).collect()[0]
    assert row["num_points"] < 10
    assert row["p10_q"] == _q(row["num_good"] / 10.0)
    # min_tf=1 judges every match relevant -> perfect recall + avp
    assert row["recall_q"] == 10000
    assert row["avp_q"] == 10000


def test_quality_k_cap():
    with pytest.raises(ValueError):
        quality_benchmark(None, ["x"], k=MAX_POINTS + 1)


# ---------------------------------------------------------------------------
# DatasetSplitter closed form == reference sequential loop
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "n,test_ratio,cv_ratio",
    [
        (0, 0.2, 0.1),
        (1, 0.2, 0.1),
        (7, 0.2, 0.1),
        (10, 0.2, 0.1),  # integer quota edge: 10*0.2 == 2.0
        (50, 0.2, 0.1),
        (50, 0.5, 0.5),  # test quota can't exceed the evens
        (50, 0.0, 0.3),
        (50, 0.3, 0.0),
        (33, 0.25, 0.25),
        (200, 0.1, 0.05),
    ],
)
def test_dataset_split_matches_sequential(spark, n, test_ratio, cv_ratio):
    expected = dataset_split_sequential(n, test_ratio, cv_ratio)
    df = spark.createDataFrame(
        [(i,) for i in range(n)], "doc_id long"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in dataset_split(df, test_ratio, cv_ratio, size=n).collect()
    }
    assert got == {i: s for i, s in enumerate(expected)}


def test_dataset_split_counts(spark, corpus_df):
    """Quotas: test gets ceil-bounded size*0.2 (evens permitting), cv
    size*0.1, rest train — and every doc is labeled exactly once."""
    n = corpus_df.count()
    out = dataset_split(corpus_df, 0.2, 0.1)
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    expected = dataset_split_sequential(n, 0.2, 0.1)
    assert counts.get("test", 0) == expected.count("test")
    assert counts.get("cv", 0) == expected.count("cv")
    assert counts.get("train", 0) == expected.count("train")
    assert sum(counts.values()) == n
