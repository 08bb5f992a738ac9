"""Round-5 part-zr twins: xQuAD diversification and subtopic recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.diversify import subtopic_recall, xquad_rerank
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, IndexSearcher(idx, mode="double")


# six equal-score docs: four aspect-A, one B, one C
EQ_ROWS = [
    (0, "q pad", "A"),
    (1, "q pad", "A"),
    (2, "q pad", "A"),
    (3, "q pad", "A"),
    (4, "q pad", "B"),
    (5, "q pad", "C"),
]


def test_xquad_promotes_uncovered_aspects(spark):
    docs, s = _engine(spark, EQ_ROWS)
    page = xquad_rerank(s, docs, "q", k=3, n_candidates=6).collect()
    # equal relevance everywhere: pick1 = d0 (A, doc tie-break); pick2
    # must jump to an uncovered aspect (B via doc tie-break), pick3 = C
    assert [(r["doc_id"], r["aspect"]) for r in page] == [(0, "A"), (4, "B"), (5, "C")]


def test_xquad_priorities_hand_computed(spark):
    docs, s = _engine(spark, EQ_ROWS)
    sq = (
        s.scored(TermQuery("q"))
        .select(F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("v"))
        .collect()[0]["v"]
    )
    page = xquad_rerank(s, docs, "q", k=3, n_candidates=6).collect()
    # na=3, smax=sq: every pick lands on an uncovered aspect -> 3s+s=4s
    assert [r["prio"] for r in page] == [4 * sq] * 3


def test_xquad_relevance_dominates_within_covered_aspect(spark):
    rows = [
        (0, "q q q q pad", "A"),   # clearly best
        (1, "q q q pad x", "A"),
        (2, "q pad x y z", "A"),
    ]
    docs, s = _engine(spark, rows)
    page = xquad_rerank(s, docs, "q", k=3, n_candidates=3).collect()
    # single aspect: xQuAD degenerates to pure relevance order
    assert [r["doc_id"] for r in page] == [0, 1, 2]


def test_xquad_beats_plain_ranking_on_s_recall(spark):
    docs, s = _engine(spark, EQ_ROWS)
    plain = subtopic_recall(s, docs, "q", k=3, n_candidates=6).collect()[0]
    page = xquad_rerank(s, docs, "q", k=3, n_candidates=6).collect()
    xq_cov = len({r["aspect"] for r in page})
    assert plain["n_aspects"] == 3
    assert xq_cov == 3 > plain["covered"]  # plain top-3 = A,A,A


def test_subtopic_recall_bounds(spark):
    docs, s = _engine(spark, EQ_ROWS)
    r = subtopic_recall(s, docs, "q", k=6, n_candidates=6).collect()[0]
    assert r["k_eff"] == 6 and r["covered"] == r["n_aspects"] == 3


def test_xquad_validates_inputs(spark):
    docs, s = _engine(spark, EQ_ROWS)
    with pytest.raises(ValueError):
        xquad_rerank(s, docs, "q", k=0)
    with pytest.raises(ValueError):
        xquad_rerank(s, docs, "q", k=10, n_candidates=5)
    with pytest.raises(ValueError):
        subtopic_recall(s, docs, "q", k=0)
