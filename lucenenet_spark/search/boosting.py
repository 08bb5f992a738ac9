"""BoostingQuery: demote (or promote) matches of a context query.

Reference: Lucene.Net.Queries/BoostingQuery.cs:41-106 — rewrites to
``BooleanQuery(match MUST, context SHOULD)`` where the context clause's
boost is 0 (context-only matches contribute nothing and cannot match
alone) and a Coord override multiplies the final score by ``boost`` only
when BOTH clauses matched (overlap==2 → boost, overlap==1 → 1.0).

Net semantics: ``score(doc) = score_match(doc) * (boost if doc ∈ context
else 1)`` over exactly the match query's doc set.

Spark mapping: one left join of the match query's scored frame against
the context docset — the context side is a non-scoring Filter plan
(docset), so no second BM25 pass runs, and the join key is the already
partitioned doc_id.  At cluster scale the context docset for a selective
query is broadcast-size; Catalyst/AQE picks the broadcast strategy
without a forced hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Query
from lucenenet_spark.search.searcher import IndexSearcher


def boosting_scored(
    searcher: IndexSearcher, match: Query, context: Query, boost: float
) -> DataFrame:
    """DataFrame[doc_id, score] — match's scores, multiplied by ``boost``
    on docs also matching ``context`` (BoostingQuery.cs Coord table:
    overlap 2 → boost, overlap 1 → 1.0, context alone → excluded)."""
    m = searcher.scored(match)
    ctx = searcher.docset(context).select("doc_id").withColumn("_ctx", F.lit(1))
    return m.join(ctx, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_ctx").isNotNull(), F.col("score") * F.lit(float(boost)))
        .otherwise(F.col("score"))
        .alias("score"),
    )


def boosting_search(
    searcher: IndexSearcher, match: Query, context: Query, boost: float, k: int = 10
) -> DataFrame:
    """Top-k over boosting_scored with the standard (score DESC, doc_id
    ASC) tie-break (HitQueue.cs:88)."""
    return (
        boosting_scored(searcher, match, context, boost)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
