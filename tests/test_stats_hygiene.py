"""Term-stats scale hygiene (r6): dictionary size is memoized on the index
and persisted by save(), so opening searchers never repeats the full
term_stats scan and a loaded index runs zero dictionary-count jobs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucenenet_spark import IndexSearcher, build_index  # noqa: E402
from lucenenet_spark.index.builder import InvertedIndex  # noqa: E402
from lucenenet_spark.search.queries import TermQuery  # noqa: E402


def test_n_terms_memoized_and_persisted(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7}") for i in range(40)], "doc_id long, text string"
    )
    idx = build_index(docs)
    assert idx.n_terms is None
    n = idx.count_terms()
    assert n == idx.n_terms > 0
    # a second searcher over the same index reuses the memo (no new count)
    idx.term_stats = None  # would explode if count_terms ran again
    assert idx.count_terms() == n
    idx = build_index(docs)  # restore a working index for save()

    path = str(tmp_path / "idx")
    idx.save(path)
    loaded = InvertedIndex.load(spark, path)
    assert loaded.n_terms == n  # persisted: no dictionary job on open

    s = IndexSearcher(loaded)
    rows = s.search(TermQuery("alpha"), 5).collect()
    assert len(rows) == 5


def test_searcher_pushdown_above_dict_ceiling(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7}") for i in range(40)], "doc_id long, text string"
    )
    idx = build_index(docs)
    s = IndexSearcher(idx, stats_cache_max_terms=2)  # force pushdown path
    rows = s.search(TermQuery("alpha"), 5).collect()
    assert s._stats_dict is None  # dict skipped, pushdown served the query
    assert len(rows) == 5
    s2 = IndexSearcher(idx)  # default: small vocab -> Arrow-backed dict
    assert [
        (r["doc_id"], round(r["score"], 6))
        for r in s2.search(TermQuery("alpha"), 5).collect()
    ] == [(r["doc_id"], round(r["score"], 6)) for r in rows]
