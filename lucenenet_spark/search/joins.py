"""Join module: query-time value join + index-time parent/child block join.

Reference: src/Lucene.Net.Join — JoinUtil.CreateJoinQuery (value join, already
covered by the join_by_source gate) and ToParentBlockJoinQuery /
ToChildBlockJoinQuery (ToParentBlockJoinQuery.cs, ~500 LoC) with ScoreMode
None | Avg | Max | Total: child docs matching a child query are folded into
their parent with the chosen aggregate of child scores.

Spark mapping: the "block" (contiguous parent+children docIDs) is an
index-layout trick to make the parent lookup O(1); relationally it IS a
groupBy(parent_key) — so ours is exactly that, over any child DataFrame
carrying (parent_key, score)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCORE_AGGS = {
    "none": lambda c: F.lit(1.0),
    "avg": F.avg,
    "max": F.max,
    "total": F.sum,
}


def to_parent_block_join(
    children: DataFrame,
    parent_key: str,
    score_col: str = "score",
    score_mode: str = "avg",
) -> DataFrame:
    """(parent_key, score, n_children) for parents with >= 1 matching child.

    ScoreMode per ToParentBlockJoinQuery.cs: None -> constant 1, Avg/Max/
    Total -> aggregate of child scores."""
    mode = score_mode.lower()
    if mode not in _SCORE_AGGS:
        raise ValueError(f"score_mode must be one of {sorted(_SCORE_AGGS)}")
    agg = (
        F.lit(1.0).alias("score")
        if mode == "none"
        else _SCORE_AGGS[mode](F.col(score_col)).alias("score")
    )
    return children.groupBy(parent_key).agg(agg, F.count(F.lit(1)).alias("n_children"))


def to_child_block_join(
    parents: DataFrame, children: DataFrame, parent_key: str
) -> DataFrame:
    """ToChildBlockJoinQuery: children of matching parents (semi join).

    The parent docset is NOT force-broadcast — a broad parent query can
    match most of the corpus, and a forced broadcast of that would OOM
    executors at scale; AQE promotes the join to broadcast on its own
    whenever the matched parent set is actually small."""
    return children.join(parents.select(parent_key).distinct(), parent_key, "left_semi")


def join_util_scored(
    from_scored: DataFrame,
    from_attrs: DataFrame,
    to_docs: DataFrame,
    *,
    join_col: str,
    score_mode: str = "max",
    score_col: str = "score",
    from_id_col: str = "doc_id",
    to_id_col: str = "doc_id",
) -> DataFrame:
    """JoinUtil.CreateJoinQuery with a scoring ScoreMode (Total | Max | Avg):
    (to_doc_id, score) where score is the chosen aggregate of the from-side
    query scores sharing each join value.

    Reference: Lucene.Net.Join/JoinUtil.cs:77-82 builds a
    TermsWithScoreCollector (one aggregated float per distinct from-value,
    TermsWithScoreCollector.cs Total/Max/Avg branches) and wraps it in
    TermsIncludingScoreQuery (TermsIncludingScoreQuery.cs:27), whose scorer
    assigns every to-doc carrying a collected term that term's aggregate.

    Spark shape: the per-value aggregation is a groupBy over the matched
    from-docs only (query-selective, small), then ONE equi-join against the
    to side. The aggregated value table is not force-broadcast — a broad
    from-query can cover most distinct values and AQE promotes the join
    when the set is genuinely small. ScoreMode.None is the unscored
    TermsQuery path already covered by `join_by_source`."""
    mode = score_mode.lower()
    if mode not in ("total", "max", "avg"):
        raise ValueError(f"score_mode must be total|max|avg, got {score_mode!r}")
    agg = {"total": F.sum, "max": F.max, "avg": F.avg}[mode]
    per_value = (
        from_scored.join(from_attrs, from_id_col)
        .groupBy(join_col)
        .agg(agg(F.col(score_col)).alias("join_score"))
    )
    return to_docs.join(per_value, join_col).select(
        F.col(to_id_col), F.col("join_score").alias(score_col)
    )
