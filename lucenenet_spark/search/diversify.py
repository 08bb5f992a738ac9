"""Explicit-aspect search-result diversification.

* ``xquad_rerank`` — xQuAD (Santos, Macdonald & Ounis, "Exploiting
  Query Reformulations for Web Search Result Diversification", WWW
  2010): greedily re-rank a relevance candidate list to balance
  relevance against coverage of the query's aspects.  Aspects here are
  a categorical document attribute (e.g. ``source``), membership is
  binary, aspect priors are uniform, and the mixing weight is the
  paper's λ = 0.5 — under which the xQuAD marginal

      (1-λ)·P(d|q) + λ·Σ_a P(a|q)·P(d|a)·Π_{d'∈S}(1 - P(d'|a))

  collapses to the EXACT integer priority

      |A| · s_d  +  s_max · [aspect(d) not yet covered]

  (multiply through by 2·|A|·s_max; P(d|q) = s_d/s_max, P(a|q) =
  1/|A|, and the product term is 1 until an aspect is covered, then
  0).  The greedy loop runs as ONE ``F.aggregate`` fold over the
  collected candidate structs — k steps of integer arithmetic on a
  bounded (top-n) list, the team-draft discipline: no driver loop, no
  float drift, and the oracle replays the identical fold as a
  recursive CTE.

* ``subtopic_recall`` — S-recall@k (Zhai, Cohen & Lafferty, "Beyond
  Independent Relevance: Methods and Evaluation Metrics for Subtopic
  Retrieval", SIGIR 2003): |aspects covered in the top k| / |aspects
  in the candidate pool| — the metric xQuAD optimizes, reported as
  exact integers (covered, n_aspects).

Scale shape: candidates are the retriever's bounded top-n; everything
downstream is arithmetic over one n-row list per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import TermQuery

__all__ = ["xquad_rerank", "subtopic_recall", "pm2_rerank"]


def _candidates(searcher, docs: DataFrame, term: str, n: int, aspect_col: str):
    scored = searcher.scored(TermQuery(term)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("s_q"),
    )
    w = Window.orderBy(F.desc("s_q"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= n)
        .join(docs.select("doc_id", F.col(aspect_col).alias("aspect")), "doc_id")
    )


def xquad_rerank(
    searcher,
    docs: DataFrame,
    term: str,
    k: int = 10,
    n_candidates: int = 20,
    aspect_col: str = "source",
) -> DataFrame:
    """(pos, doc_id, aspect, prio): the xQuAD page, λ=0.5, uniform
    aspect priors, binary membership — integer-exact greedy."""
    if k < 1 or n_candidates < k:
        raise ValueError(f"need 1 <= k <= n_candidates, got k={k} n={n_candidates}")
    cand = _candidates(searcher, docs, term, n_candidates, aspect_col)
    packed = cand.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rnk"), F.col("doc_id"), F.col("s_q"), F.col("aspect")))
        ).alias("l")
    ).select(
        "l",
        F.size(F.array_distinct(F.transform(F.col("l"), lambda e: e["aspect"])))
        .cast("long")
        .alias("na"),
        F.col("l")[0]["s_q"].cast("long").alias("smax"),
    )

    init = F.struct(
        F.array().cast("array<bigint>").alias("sel"),
        F.array().cast("array<string>").alias("covered"),
        F.array()
        .cast("array<struct<doc_id:bigint,aspect:string,prio:bigint>>")
        .alias("out"),
    )

    def _step(acc, _i):
        cands = F.filter(
            F.col("l"), lambda e: ~F.array_contains(acc["sel"], e["doc_id"])
        )
        keyed = F.transform(
            cands,
            lambda e: F.struct(
                (
                    -(
                        F.col("na") * e["s_q"]
                        + F.when(
                            F.array_contains(acc["covered"], e["aspect"]),
                            F.lit(0),
                        ).otherwise(F.col("smax"))
                    )
                )
                .cast("bigint")
                .alias("negp"),
                e["doc_id"].cast("bigint").alias("doc_id"),
                e["aspect"].alias("aspect"),
            ),
        )
        best = F.try_element_at(F.array_sort(keyed), F.lit(1))
        entry = F.struct(
            best["doc_id"].alias("doc_id"),
            best["aspect"].alias("aspect"),
            (-best["negp"]).cast("bigint").alias("prio"),
        )
        return F.struct(
            F.when(best.isNull(), acc["sel"])
            .otherwise(F.array_append(acc["sel"], best["doc_id"]))
            .alias("sel"),
            F.when(
                best.isNull() | F.array_contains(acc["covered"], best["aspect"]),
                acc["covered"],
            )
            .otherwise(F.array_append(acc["covered"], best["aspect"]))
            .alias("covered"),
            F.when(best.isNull(), acc["out"])
            .otherwise(F.array_append(acc["out"], entry))
            .alias("out"),
        )

    folded = packed.select(
        F.aggregate(F.sequence(F.lit(1), F.lit(k)), init, _step)["out"].alias("out")
    )
    return folded.select(F.posexplode("out").alias("idx", "e")).select(
        (F.col("idx") + F.lit(1)).cast("long").alias("pos"),
        F.col("e.doc_id").alias("doc_id"),
        F.col("e.aspect").alias("aspect"),
        F.col("e.prio").alias("prio"),
    )


def subtopic_recall(
    searcher,
    docs: DataFrame,
    term: str,
    k: int = 10,
    n_candidates: int = 20,
    aspect_col: str = "source",
) -> DataFrame:
    """One row (k_eff, covered, n_aspects): S-recall@k of the PLAIN
    relevance ranking against the candidate pool's aspect set."""
    if k < 1 or n_candidates < k:
        raise ValueError(f"need 1 <= k <= n_candidates, got k={k} n={n_candidates}")
    cand = _candidates(searcher, docs, term, n_candidates, aspect_col)
    return cand.agg(
        F.sum(F.when(F.col("rnk") <= k, 1).otherwise(0)).cast("long").alias("k_eff"),
        F.count_distinct(F.when(F.col("rnk") <= k, F.col("aspect")))
        .cast("long")
        .alias("covered"),
        F.count_distinct(F.col("aspect")).cast("long").alias("n_aspects"),
    )


def pm2_rerank(
    searcher,
    docs: DataFrame,
    term: str,
    k: int = 10,
    n_candidates: int = 20,
    aspect_col: str = "source",
) -> DataFrame:
    """PM-2 proportional diversification (Dang & Croft, "Diversity by
    Proportionality: An Election-based Approach to Search Result
    Diversification", SIGIR 2012): allocate the k result slots to
    aspects like parliament seats under the Sainte-Laguë method — each
    step awards the slot to the aspect with the largest quotient
    votes / (2·seats + 1), then fills it with that aspect's best
    remaining document.  Votes are the aspect's candidate count
    (population proportionality); binary membership makes the paper's
    within-aspect scoring collapse to plain relevance order.

    One sort key drives each pick: (aspect quotient DESC, aspect ASC,
    s_q DESC, doc_id ASC) over the unselected candidates — aspects with
    no documents left simply have no rows, so seat allocation skips
    them exactly as the paper's argmax over non-exhausted aspects.
    The quotient is the one double (an IEEE division of two small
    integers, bit-identical in any engine); everything else is integer.
    Seats ride INSIDE the candidate structs and are bumped by a plain
    per-element transform after each pick, so the whole greedy runs as
    one F.aggregate fold (team-draft discipline, no driver loop).

    Output: (pos, doc_id, aspect, seats_after) — seats_after is the
    chosen aspect's seat count including this pick.
    """
    if k < 1 or n_candidates < k:
        raise ValueError(f"need 1 <= k <= n_candidates, got k={k} n={n_candidates}")
    cand = _candidates(searcher, docs, term, n_candidates, aspect_col)
    votes = cand.groupBy("aspect").agg(F.count(F.lit(1)).cast("long").alias("votes"))
    packed = (
        cand.join(votes, "aspect")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rnk"),
                        F.col("doc_id"),
                        F.col("s_q"),
                        F.col("aspect"),
                        F.col("votes"),
                        F.lit(0).cast("long").alias("seats"),
                    )
                )
            ).alias("l")
        )
    )

    init = F.struct(
        F.array().cast("array<bigint>").alias("sel"),
        F.col("l").alias("st"),
        F.array()
        .cast("array<struct<doc_id:bigint,aspect:string,seats_after:bigint>>")
        .alias("out"),
    )

    def _step(acc, _i):
        keyed = F.transform(
            F.filter(acc["st"], lambda e: ~F.array_contains(acc["sel"], e["doc_id"])),
            lambda e: F.struct(
                (
                    -(
                        e["votes"].cast("double")
                        / (F.lit(2) * e["seats"] + F.lit(1)).cast("double")
                    )
                ).alias("negq"),
                e["aspect"].alias("aspect"),
                (-e["s_q"]).cast("bigint").alias("negs"),
                e["doc_id"].cast("bigint").alias("doc_id"),
                # trailing field: never reached by the sort (doc_id is
                # unique), just carried so seats_after needs no lookup
                e["seats"].cast("bigint").alias("seats"),
            ),
        )
        best = F.try_element_at(F.array_sort(keyed), F.lit(1))
        new_st = F.transform(
            acc["st"],
            lambda e: F.struct(
                e["rnk"].alias("rnk"),
                e["doc_id"].alias("doc_id"),
                e["s_q"].alias("s_q"),
                e["aspect"].alias("aspect"),
                e["votes"].alias("votes"),
                (
                    e["seats"]
                    + F.when(e["aspect"] == best["aspect"], F.lit(1)).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("seats"),
            ),
        )
        entry = F.struct(
            best["doc_id"].alias("doc_id"),
            best["aspect"].alias("aspect"),
            (best["seats"] + F.lit(1)).cast("bigint").alias("seats_after"),
        )
        return F.struct(
            F.when(best.isNull(), acc["sel"])
            .otherwise(F.array_append(acc["sel"], best["doc_id"]))
            .alias("sel"),
            F.when(best.isNull(), acc["st"]).otherwise(new_st).alias("st"),
            F.when(best.isNull(), acc["out"])
            .otherwise(F.array_append(acc["out"], entry))
            .alias("out"),
        )

    folded = packed.select(
        F.aggregate(F.sequence(F.lit(1), F.lit(k)), init, _step)["out"].alias("out")
    )
    return folded.select(F.posexplode("out").alias("idx", "e")).select(
        (F.col("idx") + F.lit(1)).cast("long").alias("pos"),
        F.col("e.doc_id").alias("doc_id"),
        F.col("e.aspect").alias("aspect"),
        F.col("e.seats_after").alias("seats_after"),
    )
