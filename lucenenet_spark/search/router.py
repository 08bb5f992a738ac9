"""Serving-layer query router: dispatch parsed queries to the packed-block
single-job path when the shape allows, else the exploded-postings searcher.

This is the reader-side composition the reference performs inside
IndexSearcher.CreateNormalizedWeight/BulkScorer selection: pick the
cheapest scorer for the query shape.  Block-eligible shapes (TermQuery,
flat OR/AND over terms, exact phrase) cover the overwhelming share of a
web query log; everything else (spans, fuzzy, ranges, msm, nested
booleans) falls back to the exploded searcher, which handles the full
query algebra.  Both paths are rank-identical (same float32 BM25), so
routing is purely a physical decision — exactly what a planner is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.block_searcher import BlockIndexSearcher
from lucenenet_spark.search.queries import (
    BooleanQuery,
    BoostQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
    rewrite,
)
from lucenenet_spark.search.searcher import IndexSearcher


class RoutedSearcher:
    """IndexSearcher facade that serves block-eligible shapes from
    BlockIndexSearcher (one lazy job per query, WAND-pruned) and the rest
    from the exploded path."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame | None = None,
                 plan_cache_size: int = 1024):
        self.index = index
        self.block = BlockIndexSearcher(index, blocks)
        self.exploded = IndexSearcher(index, mode="lucene")
        self.last_route: str = ""
        # driver-side plan cache: query values are frozen dataclasses, so
        # (query, k) keys the compiled lazy DataFrame — a repeated query
        # skips rewrite/routing/plan construction entirely (the analogue
        # of the reference's LRUQueryCache/CachingWrapperFilter at the
        # plan level; results stay fresh because the plan is lazy over
        # the live blocks/postings tables)
        self._plan_cache: dict = {}
        self._plan_cache_size = plan_cache_size

    def warm(self, terms: list[str] | None = None) -> None:
        """Reader-open warm-up: load term stats + block metadata for the
        given terms (or just force the lazy caches into existence)."""
        if terms:
            fld = self.index.default_field
            self.exploded._term_stats([(fld, t) for t in terms])
            self.block._load_meta(fld, terms)

    def search(self, query: Query, k: int = 10,
               after: tuple[float, int] | None = None) -> DataFrame:
        """Top-k (optionally a SearchAfter page: `after` = (score, doc_id)
        of the previous page's last hit — both paths compose the keyset
        predicate into the same single-job plan)."""
        key = (query, k, after)
        hit = self._plan_cache.get(key)
        if hit is not None:
            plan, route = hit
            self.last_route = route + "+cached"
            return plan
        q = rewrite(query)
        plan = self._route(q, k, after)
        route = "block" if plan is not None else "exploded"
        if plan is None:
            plan = (
                self.exploded.search(q, k)
                if after is None
                else self.exploded.search_after(after, q, k)
            )
        self.last_route = route
        if len(self._plan_cache) >= self._plan_cache_size:
            self._plan_cache.pop(next(iter(self._plan_cache)))  # FIFO evict
        self._plan_cache[key] = (plan, route)
        return plan

    def search_after(self, after: tuple[float, int] | None, query: Query,
                     k: int = 10) -> DataFrame:
        """IndexSearcher.SearchAfter argument order, routed."""
        return self.search(query, k, after=after)

    # ------------------------------------------------------------- routing
    def _route(self, q: Query, k: int,
               after: tuple[float, int] | None = None) -> DataFrame | None:
        def term_boost(c: Query):
            if isinstance(c, TermQuery) and c.field is None:
                return c.term, c.boost
            if (
                isinstance(c, BoostQuery)
                and isinstance(c.query, TermQuery)
                and c.query.field is None
            ):
                return c.query.term, c.boost * c.query.boost
            return None

        if isinstance(q, (TermQuery, BoostQuery)):
            tb = term_boost(q)
            if tb:
                return self.block.topk_term(tb[0], k, boost=tb[1], after=after)
            return None
        if isinstance(q, PhraseQuery):
            if after is not None:
                return None  # phrase pages fall back to the exploded keyset
            consecutive = q.resolved_positions() == tuple(range(len(q.terms)))
            if (
                q.slop == 0
                and q.field is None
                and q.boost == 1.0
                and consecutive
                and len(q.terms) >= 2
            ):
                return self.block.topk_phrase(tuple(q.terms), k)
            return None
        if isinstance(q, BooleanQuery):
            if q.minimum_should_match or q.boost != 1.0:
                return None
            occurs = {c.occur for c in q.clauses}
            tbs = [term_boost(c.query) for c in q.clauses]
            if any(tb is None for tb in tbs):
                return None
            if occurs == {Occur.SHOULD}:
                weights: dict[str, float] = {}
                for t, b in tbs:
                    if t in weights:  # duplicate terms: keep exploded semantics
                        return None
                    weights[t] = b
                return self.block.topk_or(weights, k, after=after)
            if occurs == {Occur.MUST} and all(b == 1.0 for _, b in tbs):
                terms = [t for t, _ in tbs]
                if len(set(terms)) == len(terms):
                    return self.block.topk_and(terms, k, after=after)
            return None
        return None
