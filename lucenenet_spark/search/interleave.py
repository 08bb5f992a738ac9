"""Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM 2008) —
the online-evaluation primitive: merge two rankers' lists into one
result page so that live clicks credit the ranker that contributed each
hit.  Production search ships interleaved pages for a fraction of
traffic and reads the team-credit click totals as a paired preference
test — far more sensitive than A/B on the same traffic.

Deterministic variant: the per-round coin flip is replaced by strict
round alternation (round 1: A picks first, round 2: B first, ... — the
ABBA pick pattern), which keeps the interleaving reproducible across
engines and runs; the team-draft invariants (each team contributes its
own highest not-yet-picked result; positions never starve a team by
more than one pick) are unchanged.

Scale shape: both inputs are already top-k lists (<= k rows each), so
the merge is a fold over at most 2k steps on a single combined row —
O(k^2) driver-free Column work, no shuffle, regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def team_draft_interleave(
    ranking_a: DataFrame, ranking_b: DataFrame, k: int = 10
) -> DataFrame:
    """Interleave two (doc_id, rank) top-k rankings.

    Returns (pos, doc_id, team): the merged page in presentation order,
    team 'A'/'B' crediting the ranker that contributed each document.
    Pick schedule: round r = picks 2r-1 and 2r; A leads odd rounds, B
    leads even rounds.  Each pick takes the scheduled team's
    highest-ranked document not yet on the page; a team whose whole
    list is already picked contributes nothing that step.
    """
    def _as_list(r: DataFrame):
        return (
            r.filter(F.col("rank") <= k)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rank"), F.col("doc_id")))
                    ),
                    lambda s: s["doc_id"],
                ).alias("l")
            )
        )

    both = (
        _as_list(ranking_a)
        .withColumnRenamed("l", "la")
        .crossJoin(_as_list(ranking_b).withColumnRenamed("l", "lb"))
    )

    init = F.struct(
        F.array().cast("array<bigint>").alias("picked"),
        F.array().cast("array<struct<doc_id:bigint,team:string>>").alias("out"),
    )

    def _step(acc, i):
        # round r = ceil(i/2); A leads odd rounds -> team A iff
        # (r odd) == (i odd), the ABBA pattern
        r = F.floor((i + F.lit(1)) / F.lit(2))
        team_a = (r % 2 == 1) == (i % 2 == 1)
        lst = F.when(team_a, F.col("la")).otherwise(F.col("lb"))
        cand = F.filter(
            lst, lambda e: ~F.array_contains(acc["picked"], e)
        )
        pick = F.try_element_at(cand, F.lit(1))
        entry = F.struct(
            pick.cast("bigint").alias("doc_id"),
            F.when(team_a, F.lit("A")).otherwise(F.lit("B")).alias("team"),
        )
        return F.struct(
            F.when(pick.isNull(), acc["picked"])
            .otherwise(F.array_append(acc["picked"], pick))
            .alias("picked"),
            F.when(pick.isNull(), acc["out"])
            .otherwise(F.array_append(acc["out"], entry))
            .alias("out"),
        )

    folded = both.select(
        F.aggregate(
            F.sequence(F.lit(1), F.lit(2 * k)), init, _step
        )["out"].alias("out")
    )
    return folded.select(
        F.posexplode("out").alias("idx", "e")
    ).select(
        (F.col("idx") + F.lit(1)).cast("long").alias("pos"),
        F.col("e.doc_id").alias("doc_id"),
        F.col("e.team").alias("team"),
    )


def interleave_credit(interleaved: DataFrame, clicks: DataFrame) -> DataFrame:
    """Credit assignment over an interleaved page (the second half of
    the Radlinski CIKM'08 protocol): clicked documents credit the team
    that contributed them; the per-impression winner is the team with
    more credited clicks.

    ``interleaved``: (pos, doc_id, team) as produced by
    team_draft_interleave.  ``clicks``: (doc_id) — the clicked docs
    (any extra columns ignored; clicks on docs not on the page don't
    count, exactly as in the online protocol).

    Output one row: (clicks_a, clicks_b, winner) with winner in
    {'A','B','tie'} — the paired-preference sample an experiment
    aggregates over impressions.
    """
    credited = interleaved.join(clicks.select("doc_id").distinct(), "doc_id")
    agg = credited.agg(
        F.coalesce(F.sum(F.when(F.col("team") == "A", 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("clicks_a"),
        F.coalesce(F.sum(F.when(F.col("team") == "B", 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("clicks_b"),
    )
    return agg.select(
        "clicks_a",
        "clicks_b",
        F.when(F.col("clicks_a") > F.col("clicks_b"), F.lit("A"))
        .when(F.col("clicks_b") > F.col("clicks_a"), F.lit("B"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )
