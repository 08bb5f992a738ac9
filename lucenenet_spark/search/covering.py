"""CoveringQuery: per-document dynamic minimumNumberMatch.

The successor engine's CoveringQuery generalizes BooleanQuery's static
``minimumNumberShouldMatch`` (BooleanQuery.cs MinimumNumberShouldMatch)
to a per-document threshold read from a LongValuesSource: a document
matches when at least ``minMatch(doc)`` of the sub-queries match it, and
scores the SUM of the matching sub-queries' scores.

Spark-first shape: every clause is scored by the normal searcher plans,
the union is one groupBy(doc_id) producing (match count, score sum), and
the LongValuesSource is any Column expression over the per-doc frame —
the threshold compare is a plain filter that stays in whole-stage
codegen.  No per-clause bitset walk, no driver loop; at cluster scale
the single shuffle is keyed by doc_id exactly like the boolean scorer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Query
from lucenenet_spark.search.searcher import IndexSearcher


def covering_scored(
    searcher: IndexSearcher,
    queries: list[Query],
    min_match: Column | Callable[[Column], Column],
    clause_transform: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Score a CoveringQuery -> (doc_id, n_matched, score).

    ``min_match`` is the LongValuesSource analogue: either a Column
    expression over the output frame (``doc_id`` is in scope) or a
    callable receiving the doc_id Column.  Documents where the matched
    clause count falls below their threshold are dropped; survivors
    score the sum of their matching clauses (CoveringScorer.score()).

    ``clause_transform`` optionally maps each clause's score Column
    before the sum (default identity).  Gates pass the bigint quantizer
    here so the aggregate is a sum of INTEGERS — associative, hence
    hash-stable under Spark's nondeterministic partial-agg order, which
    a 3+-clause double sum is not.
    """
    if not queries:
        raise ValueError("CoveringQuery needs at least one sub-query")
    u = None
    for q in queries:
        part = searcher.scored(q).select("doc_id", "score")
        if clause_transform is not None:
            part = part.select("doc_id", clause_transform(F.col("score")).alias("score"))
        u = part if u is None else u.unionByName(part)
    agg = u.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum("score").alias("score"),
    )
    thr = min_match(F.col("doc_id")) if callable(min_match) else min_match
    return agg.filter(F.col("n_matched") >= thr)
