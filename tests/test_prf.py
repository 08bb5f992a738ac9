"""Rocchio/RM3 PRF invariants (search/prf.py)."""

import pytest
from pyspark.sql import SparkSession

from lucenenet_spark.plans.gate import get_engine
from lucenenet_spark.search.prf import (
    feedback_terms,
    rocchio_expanded_query,
    rocchio_search,
)
from lucenenet_spark.search.queries import Occur, TermQuery

SF = "/root/testdata/sf0.001"


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


def test_feedback_terms_exclude_original_and_bounded(spark):
    idx, searcher, _ = get_engine(spark, SF)
    terms = feedback_terms(idx, searcher, "vector", fb_docs=10, fb_terms=5)
    assert len(terms) == 5
    assert "vector" not in terms
    assert len(set(terms)) == 5


def test_expanded_query_shape(spark):
    idx, searcher, _ = get_engine(spark, SF)
    q = rocchio_expanded_query(idx, searcher, "vector", fb_terms=3, beta=0.25)
    assert len(q.clauses) == 4
    assert all(c.occur is Occur.SHOULD for c in q.clauses)
    assert q.clauses[0].query == TermQuery("vector")
    assert all(c.query.boost == 0.25 for c in q.clauses[1:])


def test_beta_zero_degenerates_to_reranked_original(spark):
    """With beta=0 the expansion contributes no score: the expanded
    search's scores equal the plain term query's — but expansion-only
    docs may appear with score 0 at the tail."""
    from lucenenet_spark.plans.gate import _spark_score_q

    idx, searcher, _ = get_engine(spark, SF)
    plain = {
        r["doc_id"]: r["score_q"]
        for r in _spark_score_q(searcher.scored(TermQuery("vector"))).collect()
    }
    fed = rocchio_search(idx, searcher, "vector", k=10, beta=0.0).collect()
    for r in fed:
        assert plain.get(r["doc_id"], 0) == r["score_q"]


def test_expansion_monotone_for_matching_docs(spark):
    """beta>0 can only add score to any doc the original query matched."""
    from lucenenet_spark.plans.gate import _spark_score_q

    idx, searcher, _ = get_engine(spark, SF)
    plain = {
        r["doc_id"]: r["score_q"]
        for r in _spark_score_q(searcher.scored(TermQuery("vector"))).collect()
    }
    fed = {
        r["doc_id"]: r["score_q"]
        for r in rocchio_search(idx, searcher, "vector", k=10, beta=0.3).collect()
    }
    for d, s in fed.items():
        if d in plain:
            assert s >= plain[d]
