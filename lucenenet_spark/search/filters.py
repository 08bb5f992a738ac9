"""Filter composition: ChainedFilter and BooleanFilter.

Reference:
- Lucene.Net.Queries/ChainedFilter.cs:43-262 — fold a chain of filters
  into one doc set with per-link logic OR/AND/ANDNOT/XOR.  The initial
  result is EMPTY; a first link with AND seeds the result with that
  filter's set, a first link with ANDNOT seeds it with the set's
  COMPLEMENT (InitialResult, ChainedFilter.cs:136-152); every other
  logic starts the fold from the empty set (so a leading XOR/OR behaves
  like OR of the first link).
- Lucene.Net.Queries/BooleanFilter.cs:36-110 — boolean algebra over doc
  sets: any SHOULD present → union of SHOULDs; each MUST intersects;
  each MUST_NOT subtracts; MUST_NOT-only chains start from all docs.

Spark mapping: each filter is a non-scoring docset plan (one column,
doc_id); the fold composes them with semi/anti joins and unions — all
shuffle on the same doc_id key, so AQE coalesces the exchanges, and no
scoring work runs anywhere in the chain (GetDocIdSet never scores).
XOR is the union of the two anti-joins (symmetric difference).
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Occur, Query
from lucenenet_spark.search.searcher import IndexSearcher

# ChainedFilter.cs:45-48
OR = 0
AND = 1
ANDNOT = 2
XOR = 3


def _all_docs(searcher: IndexSearcher) -> DataFrame:
    """The reader's full doc universe (maxDoc bitset) — doclens carries
    every live doc including zero-length ones."""
    return searcher.index.doclens.select("doc_id").distinct()


def _union(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def _intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, "doc_id", "left_semi")


def _subtract(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.join(b, "doc_id", "left_anti")


def _xor(a: DataFrame, b: DataFrame) -> DataFrame:
    return _subtract(a, b).unionByName(_subtract(b, a))


def chained_filter(
    searcher: IndexSearcher,
    chain: Sequence[Query],
    logic: int | Sequence[int] = OR,
) -> DataFrame:
    """DataFrame[doc_id] — the chain folded with per-link (or uniform)
    logic, matching ChainedFilter.GetDocIdSet's fold order exactly."""
    if not chain:
        raise ValueError("empty filter chain")
    logics = list(logic) if isinstance(logic, (list, tuple)) else [logic] * len(chain)
    if len(logics) != len(chain):
        raise ValueError("Invalid number of elements in logic array")

    sets = [searcher.docset(q).select("doc_id") for q in chain]
    # InitialResult (ChainedFilter.cs:136-152): AND seeds with the first
    # set, ANDNOT with its complement; both consume the first link.
    start = 1
    if logics[0] == AND:
        result = sets[0]
    elif logics[0] == ANDNOT:
        result = _subtract(_all_docs(searcher), sets[0])
    else:
        # empty initial result; the first link folds below (OR from empty
        # = the set; XOR from empty = the set; AND from empty = empty).
        result = None
        start = 0

    for i in range(start, len(chain)):
        s = sets[i]
        op = logics[i]
        if result is None:
            # only reachable at i=0 with OR/XOR/default logic (AND/ANDNOT
            # were consumed by InitialResult): OR and XOR from the empty
            # set are both the set itself.
            result = s
            continue
        if op == OR:
            result = _union(result, s)
        elif op == AND:
            result = _intersect(result, s)
        elif op == ANDNOT:
            result = _subtract(result, s)
        elif op == XOR:
            result = _xor(result, s)
        else:  # DoChain default → OR (ChainedFilter.cs:227-229)
            result = _union(result, s)
    return result.distinct()


def boolean_filter(
    searcher: IndexSearcher,
    clauses: Sequence[tuple[Query, Occur]],
) -> DataFrame:
    """DataFrame[doc_id] — BooleanFilter.GetDocIdSet (BooleanFilter.cs:
    48-104): SHOULD union as the base (or all docs when only MUST_NOTs),
    then MUST intersections and MUST_NOT subtractions."""
    shoulds = [searcher.docset(q).select("doc_id") for q, o in clauses if o is Occur.SHOULD]
    musts = [searcher.docset(q).select("doc_id") for q, o in clauses if o is Occur.MUST]
    nots = [searcher.docset(q).select("doc_id") for q, o in clauses if o is Occur.MUST_NOT]
    if shoulds:
        result = shoulds[0]
        for s in shoulds[1:]:
            result = _union(result, s)
    elif musts:
        result = musts[0]
        musts = musts[1:]
    else:
        result = _all_docs(searcher)
    for m in musts:
        result = _intersect(result, m)
    for n in nots:
        result = _subtract(result, n)
    return result.distinct()


def duplicate_filter(
    docs: DataFrame, key_col: str, keep: str = "last", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame[doc_id] — DuplicateFilter (Sandbox/Queries/
    DuplicateFilter.cs): keep exactly one doc per distinct ``key_col``
    value, the first or last occurrence in docID order (KeepMode
    KM_USE_FIRST_OCCURRENCE / KM_USE_LAST_OCCURRENCE). The reference
    walks each segment's postings setting bits; here it is one partial
    aggregate — min/max(doc_id) per key — so the shuffle carries one row
    per distinct key, not per doc. Docs with a NULL key have no term in
    the field's postings and are dropped, as in the reference."""
    if keep not in ("first", "last"):
        raise ValueError(f"unknown keep mode {keep!r}")
    agg = F.min(id_col) if keep == "first" else F.max(id_col)
    return (
        docs.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(agg.alias(id_col))
        .select(id_col)
    )


def field_value_filter(docs, field_col: str, *, negate: bool = False):
    """FieldValueFilter (Search/FieldValueFilter.cs:33): docs that HAVE a
    value for the field (docsWithField bits), or the complement when
    negate=True. The docvalues "has a value" bit maps to column
    NULL-ness, so this is one pushdown predicate on the scan — at 100 TB
    the parquet null-count statistics prune whole row groups before any
    row is read."""
    from pyspark.sql import functions as F

    cond = F.col(field_col).isNotNull()
    return docs.filter(~cond if negate else cond)


class CachingWrapperFilter:
    """Docset cache around a filter — CachingWrapperFilter semantics
    (reference: src/Lucene.Net/Search/CachingWrapperFilter.cs: the
    filter's DocIdSet is computed once per reader and reused; here the
    unit is the searcher's immutable index snapshot, so one entry per
    filter key).  The Spark realization caches the PERSISTED docset
    DataFrame keyed by the filter's plan string — the second use of a
    hot filter costs a cache scan, not a postings recomputation — with
    hit/miss counters and an LRU bound (the dedup-registry discipline:
    bounded driver state, evict oldest).
    """

    def __init__(self, searcher: IndexSearcher, max_entries: int = 64):
        if max_entries < 1:
            raise ValueError(f"max_entries must be >= 1, got {max_entries}")
        self._searcher = searcher
        self._max = max_entries
        self._cache: OrderedDict[str, DataFrame] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def docset(self, query: Query) -> DataFrame:
        key = repr(query)
        if key in self._cache:
            self.hits += 1
            self._cache.move_to_end(key)
            return self._cache[key]
        self.misses += 1
        ds = self._searcher.docset(query).persist()
        self._cache[key] = ds
        if len(self._cache) > self._max:
            _, old = self._cache.popitem(last=False)
            old.unpersist()
        return ds
