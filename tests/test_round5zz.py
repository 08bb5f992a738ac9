"""Round-5 part-zz twins: field-sorted searchAfter and the caching
filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.collectors import sort_search_after
from lucenenet_spark.search.filters import CachingWrapperFilter
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, size long")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return docs, IndexSearcher(idx, mode="double")


ROWS = [(i, "hit filler%d" % i, (i * 7) % 23) for i in range(25)]


# -------------------------------------------------------- sorted searchAfter
def test_ssa_pages_tile_the_full_ordering(spark):
    docs, s = _engine(spark, ROWS)
    meta = docs.select("doc_id", "size")
    q = TermQuery("hit")
    p1 = sort_search_after(s, q, meta, "size", None, k=10).collect()
    p2 = sort_search_after(
        s, q, meta, "size", (p1[-1]["size"], p1[-1]["doc_id"]), k=10
    ).collect()
    p3 = sort_search_after(
        s, q, meta, "size", (p2[-1]["size"], p2[-1]["doc_id"]), k=10
    ).collect()
    got = [r["doc_id"] for r in p1 + p2 + p3]
    want = [
        r["doc_id"]
        for r in docs.orderBy(F.desc("size"), F.asc("doc_id")).collect()
    ]
    assert got == want
    assert len(p3) == 5  # 25 docs -> last page is short


def test_ssa_ascending_order(spark):
    docs, s = _engine(spark, ROWS[:6])
    meta = docs.select("doc_id", "size")
    p1 = sort_search_after(s, TermQuery("hit"), meta, "size", None, k=3, ascending=True).collect()
    p2 = sort_search_after(
        s, TermQuery("hit"), meta, "size",
        (p1[-1]["size"], p1[-1]["doc_id"]), k=3, ascending=True
    ).collect()
    want = [r["doc_id"] for r in docs.orderBy(F.asc("size"), F.asc("doc_id")).collect()]
    assert [r["doc_id"] for r in p1 + p2] == want


def test_ssa_tie_break_within_equal_field_values(spark):
    rows = [(i, "hit x", 5) for i in range(7)]
    docs, s = _engine(spark, rows)
    meta = docs.select("doc_id", "size")
    p1 = sort_search_after(s, TermQuery("hit"), meta, "size", None, k=4).collect()
    p2 = sort_search_after(s, TermQuery("hit"), meta, "size", (5, p1[-1]["doc_id"]), k=4).collect()
    assert [r["doc_id"] for r in p1] == [0, 1, 2, 3]
    assert [r["doc_id"] for r in p2] == [4, 5, 6]


def test_ssa_validates_k(spark):
    docs, s = _engine(spark, ROWS[:2])
    with pytest.raises(ValueError):
        sort_search_after(s, TermQuery("hit"), docs, "size", None, k=0)


# ------------------------------------------------------------ caching filter
def test_cwf_hit_miss_accounting_and_results(spark):
    docs, s = _engine(spark, ROWS[:8])
    cwf = CachingWrapperFilter(s)
    q = TermQuery("hit")
    a = {r["doc_id"] for r in cwf.docset(q).collect()}
    assert (cwf.hits, cwf.misses) == (0, 1)
    b = {r["doc_id"] for r in cwf.docset(q).collect()}
    assert (cwf.hits, cwf.misses) == (1, 1)
    assert a == b == set(range(8))
    # a different query is its own entry
    q2 = BooleanQuery.of((TermQuery("hit"), Occur.MUST), (TermQuery("filler3"), Occur.MUST))
    c = {r["doc_id"] for r in cwf.docset(q2).collect()}
    assert c == {3} and (cwf.hits, cwf.misses) == (1, 2)


def test_cwf_lru_eviction(spark):
    docs, s = _engine(spark, ROWS[:6])
    cwf = CachingWrapperFilter(s, max_entries=2)
    cwf.docset(TermQuery("filler0"))
    cwf.docset(TermQuery("filler1"))
    cwf.docset(TermQuery("filler2"))   # evicts filler0
    cwf.docset(TermQuery("filler0"))   # miss again
    assert cwf.misses == 4 and cwf.hits == 0
    cwf.docset(TermQuery("filler0"))   # now cached
    assert cwf.hits == 1


def test_cwf_validates_max_entries(spark):
    _, s = _engine(spark, ROWS[:2])
    with pytest.raises(ValueError):
        CachingWrapperFilter(s, max_entries=0)
