"""Seeded multi-term WAND (r6 optimization): the seed -> achieved-theta ->
prune path must return EXACTLY the exploded searcher's results (scores and
tie-breaks) while scanning fewer blocks."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucenenet_spark import IndexSearcher, build_index  # noqa: E402
from lucenenet_spark.search.block_searcher import BlockIndexSearcher  # noqa: E402
from lucenenet_spark.search.queries import (  # noqa: E402
    BooleanQuery,
    Occur,
    TermQuery,
)


@pytest.fixture(scope="module")
def skew_setup(spark):
    # length-skewed corpus with three shared terms so block-max pruning has
    # something to bite on, large enough for several hundred blocks
    rows = [
        (
            d,
            "hot warm cool "
            + " ".join(f"f{(d * 31 + j) % 700:03d}" for j in range(5 + d // 60)),
        )
        for d in range(12_000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs).cache()
    idx.postings.count()
    seeded = BlockIndexSearcher(idx, seed_min_blocks=8)
    seeded.seed_overhead_blocks = 0  # cost model: always engage in tests
    seeded.blocks = seeded.blocks.cache()
    seeded.blocks.count()
    unseeded = BlockIndexSearcher(idx, seed_min_blocks=1 << 60)
    unseeded.blocks = seeded.blocks
    exploded = IndexSearcher(idx, mode="lucene")
    yield idx, seeded, unseeded, exploded
    seeded.blocks.unpersist()
    idx.unpersist()


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_seeded_or_rank_identical_and_prunes(skew_setup):
    idx, seeded, unseeded, exploded = skew_setup
    got = _rows(seeded.topk_or({"hot": 1.0, "warm": 1.0, "cool": 1.0}, 10))
    stats = dict(seeded.last_stats)
    want = _rows(
        exploded.search(
            BooleanQuery.of(
                (TermQuery("hot"), Occur.SHOULD),
                (TermQuery("warm"), Occur.SHOULD),
                (TermQuery("cool"), Occur.SHOULD),
            ),
            10,
        )
    )
    assert got == want
    assert stats.get("seed_blocks", 0) > 0, "seed pass did not engage"
    assert stats["blocks_scored"] < stats["blocks_total"], (
        "seeded OR did not prune any block"
    )
    # and the unseeded path agrees too (metadata theta only)
    assert _rows(unseeded.topk_or({"hot": 1.0, "warm": 1.0, "cool": 1.0}, 10)) == want


def test_seeded_and_rank_identical(skew_setup):
    idx, seeded, unseeded, exploded = skew_setup
    got = _rows(seeded.topk_and(["hot", "warm"], 10))
    stats = dict(seeded.last_stats)
    want = _rows(
        exploded.search(
            BooleanQuery.of(
                (TermQuery("hot"), Occur.MUST), (TermQuery("warm"), Occur.MUST)
            ),
            10,
        )
    )
    assert got == want
    assert stats["blocks_scored"] < stats["blocks_total"]


def test_seeded_or_search_after_pages(skew_setup):
    idx, seeded, unseeded, exploded = skew_setup
    boosts = {"hot": 1.0, "warm": 1.0, "cool": 1.0}
    q = BooleanQuery.of(
        (TermQuery("hot"), Occur.SHOULD),
        (TermQuery("warm"), Occur.SHOULD),
        (TermQuery("cool"), Occur.SHOULD),
    )
    after = None
    for _ in range(3):
        page_b = seeded.topk_or(boosts, 7, after=after).collect()
        page_e = exploded.search_after(after, q, 7).collect()
        assert [(r["doc_id"], round(r["score"], 6)) for r in page_b] == [
            (r["doc_id"], round(r["score"], 6)) for r in page_e
        ]
        last = page_b[-1]
        after = (last["score"], last["doc_id"])


def test_seeded_or_mixed_df_terms(skew_setup):
    """One rare term + two frequent terms — the asymmetric case where the
    metadata theta comes from the rare term but most mass is elsewhere."""
    idx, seeded, unseeded, exploded = skew_setup
    boosts = {"hot": 1.0, "f001": 2.0, "f500": 0.5}
    got = _rows(seeded.topk_or(boosts, 10))
    want = _rows(
        exploded.search(
            BooleanQuery.of(
                (TermQuery("hot", boost=1.0), Occur.SHOULD),
                (TermQuery("f001", boost=2.0), Occur.SHOULD),
                (TermQuery("f500", boost=0.5), Occur.SHOULD),
            ),
            10,
        )
    )
    assert got == want


def test_nextword_phrase_twin(skew_setup):
    """Two-word phrases served from the next-word pair table must be
    score- and rank-identical to the positional intersect path and the
    exploded PhraseQuery."""
    from lucenenet_spark.search.queries import PhraseQuery

    idx, seeded, unseeded, exploded = skew_setup
    positional = BlockIndexSearcher(idx, enable_nextword=False)
    positional.blocks = seeded.blocks
    got = _rows(seeded.topk_phrase(("hot", "warm"), 10))
    assert seeded.last_stats.get("nextword") is True
    assert seeded.last_stats["blocks_scored"] == 0
    assert got == _rows(positional.topk_phrase(("hot", "warm"), 10))
    assert got == _rows(exploded.search(PhraseQuery(terms=("hot", "warm")), 10))
    # 3-word phrases stay on the positional path
    got3 = _rows(seeded.topk_phrase(("hot", "warm", "cool"), 10))
    assert seeded.last_stats.get("nextword") is None
    assert got3 == _rows(exploded.search(PhraseQuery(terms=("hot", "warm", "cool")), 10))
