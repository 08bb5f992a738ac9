"""Maximal Marginal Relevance: diversity-aware top-k re-ranking.

MMR (Carbonell & Goldstein, SIGIR 1998): greedily build the result list
by repeatedly taking ``argmax over remaining candidates of
lambda * rel(c) - (1 - lambda) * max over selected s of sim(c, s)`` —
relevance discounted by redundancy against what is already shown. The
de-facto diversification pass over an ANN result list (and the shape of
result diversification the reference's grouping/collapse collectors
approximate field-wise).

Scale shape: MMR is inherently sequential, so it runs as a BOUNDED
re-rank — the candidate set is the retriever's top-n (n ~ tens), its
n x n cosine matrix is computed distributed (one narrow self-join over
the n-row candidate slice, never the corpus) and only the QUANTIZED
integer matrix is collected; the greedy loop is O(k*n) driver arithmetic
on BIGINTs, the Rescorer pattern. With lambda = L/10 every MMR value is
the integer ``L*rel_q - (10-L)*max_sim_q`` (max over the empty selected
set defined as 0), so a SQL oracle unrolling the k steps reproduces the
selection exactly — no float drift anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["candidate_sims", "mmr_rerank"]


def candidate_sims(
    emb: DataFrame,
    ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, sim_q) for every ORDERED pair of distinct candidate
    ids: quantized cosine over the bounded candidate slice (narrow
    self-join of len(ids) rows)."""
    sub = emb.filter(F.col(id_col).isin([int(i) for i in ids])).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    a = sub.alias("a")
    b = sub.alias("b")

    def fold(prod):
        return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y))
    n2a = fold(F.zip_with(F.col("a.v"), F.col("a.v"), lambda x, y: x.cast("double") * y))
    n2b = fold(F.zip_with(F.col("b.v"), F.col("b.v"), lambda x, y: x.cast("double") * y))
    sim_q = F.floor(dot / F.sqrt(n2a * n2b) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        a.join(b, F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim_q.alias("sim_q"),
        )
    )


def mmr_rerank(
    emb: DataFrame,
    candidates: list[tuple[int, int]],
    k: int = 5,
    lambda_tenths: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, int]]:
    """Greedy MMR over `candidates` = [(id, rel_q), ...] (quantized
    relevance, e.g. cosine_topk output). Returns [(step, id, mmr_q), ...]
    with step 1-based and mmr_q = L*rel_q - (10-L)*max_sim_q, ties to the
    smallest id. len(candidates) bounds all work."""
    if not 0 <= lambda_tenths <= 10:
        raise ValueError("lambda_tenths must be in [0, 10]")
    ids = [c[0] for c in candidates]
    rel = {int(i): int(r) for i, r in candidates}
    sims = {
        (r["id_a"], r["id_b"]): r["sim_q"]
        for r in candidate_sims(emb, ids, id_col, vec_col).collect()
    }
    big_l = lambda_tenths
    selected: list[tuple[int, int, int]] = []
    remaining = sorted(rel)
    while remaining and len(selected) < k:
        best = None
        for c in remaining:
            pen = max((sims[(c, s)] for _, s, _ in selected), default=0)
            val = big_l * rel[c] - (10 - big_l) * pen
            if best is None or val > best[0] or (val == best[0] and c < best[1]):
                best = (val, c)
        selected.append((len(selected) + 1, best[1], best[0]))
        remaining.remove(best[1])
    return selected


def mmr_topk(
    spark,
    emb: DataFrame,
    query_vec_id: int,
    n_candidates: int = 20,
    k: int = 5,
    lambda_tenths: int = 7,
) -> DataFrame:
    """End-to-end: exact-cosine top-n candidates, MMR re-rank to k,
    returned as a DataFrame (step, vec_id, mmr_q)."""
    from lucenenet_spark.functions.similarity import cosine_topk

    cand = [
        (r["vec_id"], r["cos_q"])
        for r in cosine_topk(emb, query_vec_id, k=n_candidates).collect()
    ]
    rows = mmr_rerank(emb, cand, k=k, lambda_tenths=lambda_tenths)
    return spark.createDataFrame(rows, "step int, vec_id long, mmr_q long")
