"""Pseudo-relevance feedback: Rocchio/RM3-style query expansion.

Classic recipe (Rocchio 1971; RM3 per Abdul-Jaleel et al., the Anserini/
Indri default): run the original query, treat the top ``fb_docs`` results
as pseudo-relevant, pick the ``fb_terms`` heaviest terms from their
postings, and re-run the query expanded with those terms at a discounted
weight ``beta``. The reference ships the same build-a-query-from-feedback
shape as MoreLikeThis (Lucene.Net.Queries/Mlt/MoreLikeThis.cs) — PRF is
its query-side twin, using the result list instead of a source document.

Distributed shape: the feedback pass is the normal top-k search; term
selection joins the index's postings against a ``fb_docs``-row broadcast
and aggregates INTEGER tf sums (deterministic ordering, term tie-break),
so only ``fb_terms`` rows ever reach the driver; the expanded query is a
standard boosted SHOULD BooleanQuery riding the same scored path as every
other query. No stage touches more data than the original search did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import BooleanClause, BooleanQuery, Occur, TermQuery

__all__ = ["feedback_terms", "rocchio_expanded_query", "rocchio_search"]


def feedback_terms(
    index,
    searcher,
    term: str,
    field: str | None = None,
    fb_docs: int = 10,
    fb_terms: int = 5,
) -> list[str]:
    """Top expansion terms from the pseudo-relevant set: sum of tf over
    the original query's top-fb_docs results (quantized-score rank,
    doc-id tie-break), original term excluded, ordered (sum tf DESC,
    term ASC) — all-integer, so any SQL oracle selects the same set."""
    fld = field or index.default_field
    scored = searcher.scored(TermQuery(term, field=field))
    topd = (
        scored.select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(fb_docs)
        .select("doc_id")
    )
    cand = (
        index.postings.filter(F.col("field") == fld)
        .join(F.broadcast(topd), "doc_id")
        .filter(F.col("term") != term)
        .groupBy("term")
        .agg(F.sum("tf").alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(fb_terms)
    )
    return [r["term"] for r in cand.collect()]


def rocchio_expanded_query(
    index,
    searcher,
    term: str,
    field: str | None = None,
    fb_docs: int = 10,
    fb_terms: int = 5,
    beta: float = 0.3,
) -> BooleanQuery:
    """Original term at weight 1.0 OR each feedback term at weight beta —
    the Rocchio q' = q + beta * centroid(relevant) update realized as a
    boosted SHOULD query (msm=0: expansion-only matches count, the RM3
    behavior)."""
    terms = feedback_terms(index, searcher, term, field, fb_docs, fb_terms)
    clauses = [BooleanClause(TermQuery(term, field=field), Occur.SHOULD)] + [
        BooleanClause(TermQuery(t, field=field, boost=beta), Occur.SHOULD)
        for t in terms
    ]
    return BooleanQuery(clauses=tuple(clauses))


def rocchio_search(
    index,
    searcher,
    term: str,
    k: int = 10,
    field: str | None = None,
    fb_docs: int = 10,
    fb_terms: int = 5,
    beta: float = 0.3,
) -> DataFrame:
    """(doc_id, score_q) top-k under the expanded query."""
    q = rocchio_expanded_query(index, searcher, term, field, fb_docs, fb_terms, beta)
    scored = searcher.scored(q)
    return (
        scored.select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(k)
    )
