"""Gate registry round-5 part zz: reader-side parity completions —
field-sorted searchAfter pagination and CachingWrapperFilter.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# sort_search_after — SearchAfter with a Sort (PagingFieldCollector
# keyset): page 2 of the n_chars-DESC ordering over one term's docset.
# The oracle serves the same page as global ranks 11..20, proving the
# keyset predicate equals window-offset pagination.
# ----------------------------------------------------------------------
_SSA_TERM = "vector"
_SSA_K = 10

_SSA_SQL = SQL_PRELUDE + f""",
m AS (
  SELECT DISTINCT p.doc_id, d.n_chars
  FROM post p JOIN documents d USING (doc_id)
  WHERE p.term = '{_SSA_TERM}'
),
rk AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS g
  FROM m
)
SELECT CAST(g - {_SSA_K} AS BIGINT) AS rank, doc_id, n_chars
FROM rk WHERE g > {_SSA_K} AND g <= {2 * _SSA_K}
"""


@gate("sort_search_after", _SSA_SQL)
def sort_search_after(spark, sf_dir):
    """Page 2 of the n_chars-sorted matches via keyset pagination."""
    from lucenenet_spark.search.collectors import sort_search_after as _ssa
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    meta = docs.select("doc_id", "n_chars")
    q = TermQuery(_SSA_TERM)
    page1 = _ssa(s, q, meta, "n_chars", None, k=_SSA_K).collect()
    last = page1[-1]
    return _ssa(
        s, q, meta, "n_chars", (last["n_chars"], last["doc_id"]), k=_SSA_K
    )


# ----------------------------------------------------------------------
# caching_filter_docset — CachingWrapperFilter.cs: second use of a hot
# filter is served from the cached persisted docset; the gate asserts
# the hit counter driver-side and hash-checks the served docset.
# ----------------------------------------------------------------------
_CF_TERM = "merge"

_CF_SQL = SQL_PRELUDE + f"""
SELECT DISTINCT doc_id, CAST(1 AS BIGINT) AS cache_hits
FROM post WHERE term = '{_CF_TERM}'
"""


@gate("caching_filter_docset", _CF_SQL)
def caching_filter_docset(spark, sf_dir):
    """Docset of a cached filter on its SECOND use (one hit, one miss)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.filters import CachingWrapperFilter
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    cwf = CachingWrapperFilter(s)
    q = TermQuery(_CF_TERM)
    cwf.docset(q)          # miss: computes + persists
    ds = cwf.docset(q)     # hit: served from cache
    if (cwf.hits, cwf.misses) != (1, 1):  # pragma: no cover
        raise AssertionError(f"cache counters wrong: {cwf.hits}/{cwf.misses}")
    return ds.select("doc_id", F.lit(1).cast("long").alias("cache_hits"))
