"""Round-5 part-zs twins: PM-2 proportionality and click entropy."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.querylog import click_entropy
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.diversify import pm2_rerank
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, IndexSearcher(idx, mode="double")


EQ_ROWS = [
    (0, "q pad", "A"),
    (1, "q pad", "A"),
    (2, "q pad", "A"),
    (3, "q pad", "A"),
    (4, "q pad", "B"),
    (5, "q pad", "C"),
]


# --------------------------------------------------------------------- pm2
def test_pm2_sainte_lague_schedule(spark):
    docs, s = _engine(spark, EQ_ROWS)
    page = pm2_rerank(s, docs, "q", k=6, n_candidates=6).collect()
    # votes A=4,B=1,C=1; quotients: A4 -> A4/3 -> B1 -> C1 -> A4/5 -> A4/7
    assert [(r["doc_id"], r["aspect"], r["seats_after"]) for r in page] == [
        (0, "A", 1),
        (1, "A", 2),
        (4, "B", 1),
        (5, "C", 1),
        (2, "A", 3),
        (3, "A", 4),
    ]


def test_pm2_single_aspect_degenerates_to_relevance(spark):
    rows = [(0, "q q q pad", "A"), (1, "q q pad x", "A"), (2, "q pad x y", "A")]
    docs, s = _engine(spark, rows)
    page = pm2_rerank(s, docs, "q", k=3, n_candidates=3).collect()
    assert [r["doc_id"] for r in page] == [0, 1, 2]
    assert [r["seats_after"] for r in page] == [1, 2, 3]


def test_pm2_within_aspect_relevance_order(spark):
    rows = [
        (0, "q pad x y", "A"),       # weaker A
        (1, "q q q pad", "A"),       # stronger A
        (2, "q pad x y", "B"),
    ]
    docs, s = _engine(spark, rows)
    page = pm2_rerank(s, docs, "q", k=3, n_candidates=3).collect()
    # A (votes 2) leads; its best doc is d1, not d0
    assert [r["doc_id"] for r in page][0] == 1
    assert [r["doc_id"] for r in page][1] == 2  # B's quotient 1 beats A's 2/3


def test_pm2_validates_inputs(spark):
    docs, s = _engine(spark, EQ_ROWS)
    with pytest.raises(ValueError):
        pm2_rerank(s, docs, "q", k=0)
    with pytest.raises(ValueError):
        pm2_rerank(s, docs, "q", k=10, n_candidates=4)


# ------------------------------------------------------------ click entropy
def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    )


def test_click_entropy_navigational_is_zero(spark):
    ev = _events(spark, [(i, "nav", '{"k": 7}') for i in range(5)])
    r = click_entropy(ev).collect()[0]
    assert (r["n_clicks"], r["n_distinct"], r["entropy_q9"]) == (5, 1, 0)


def test_click_entropy_uniform_is_ln_n(spark):
    ev = _events(spark, [(i, "info", '{"k": %d}' % i) for i in range(4)])
    r = click_entropy(ev).collect()[0]
    per_item = math.floor(-(0.25) * math.log(0.25) * 1e9 + 0.5)
    assert (r["n_clicks"], r["n_distinct"]) == (4, 4)
    assert r["entropy_q9"] == 4 * per_item


def test_click_entropy_mixed_replica(spark):
    ev = _events(
        spark,
        [(0, "m", '{"k": 1}'), (1, "m", '{"k": 1}'), (2, "m", '{"k": 2}'),
         (3, "m", '{"k": 3}')],
    )
    r = click_entropy(ev).collect()[0]
    want = (
        math.floor(-0.5 * math.log(0.5) * 1e9 + 0.5)
        + 2 * math.floor(-0.25 * math.log(0.25) * 1e9 + 0.5)
    )
    assert r["entropy_q9"] == want


def test_click_entropy_separates_intents(spark):
    ev = _events(
        spark,
        [(i, "nav", '{"k": 9}') for i in range(6)]
        + [(10 + i, "info", '{"k": %d}' % i) for i in range(6)],
    )
    rows = {r["event_type"]: r["entropy_q9"] for r in click_entropy(ev).collect()}
    assert rows["nav"] == 0 < rows["info"]
