"""Hybrid lexical+vector retrieval via Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009: "Reciprocal rank fusion
outperforms Condorcet and individual rank learning methods"): given
ranked lists from incomparable scorers, fuse on rank alone —
``rrf(d) = sum over lists of 1 / (k + rank_list(d))`` with k=60. This is
the standard way modern engines (Elasticsearch/OpenSearch/Vespa) combine
a BM25 list with an embedding-ANN list: the scores live on different
scales, the ranks don't.

Scale shape: each retriever produces its OWN bounded top-k (BM25 rides
the block-max WAND path, ANN rides IVF/PQ — neither scans for the other),
so fusion touches 2k rows total. The rank window runs over an
already-limited frame (TakeOrdered output), never the corpus; the fuse
itself is a k-row full-outer join. Every rank is assigned on quantized
scores with doc-id tie-breaks so a SQL oracle reproduces the fusion
exactly, including the 1/(k+r) double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranked", "rrf_fuse", "rrf_hybrid_topk"]

RRF_K = 60
_RRF_Q = 10_000_000  # 1/(60+r) ~ 1e-2; 1e7 keeps 5 significant digits


def ranked(topk: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, rank): 1-based rank by (score DESC, id ASC) over an
    ALREADY-LIMITED top-k frame — the single-partition window is k rows
    by construction, never the corpus."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return topk.select(
        F.col(id_col).alias("doc_id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = RRF_K, topk: int = 10
) -> DataFrame:
    """Fuse (doc_id, rank) lists: (doc_id, rrf_q, rank_0, rank_1, ...).
    Absent docs contribute nothing to the sum and report rank 0 in their
    list column. rrf_q = floor(sum(1/(k+rank)) * 1e7 + 0.5)."""
    fused = None
    for i, r in enumerate(rankings):
        r = r.select("doc_id", F.col("rank").alias(f"rank_{i}"))
        fused = r if fused is None else fused.join(r, "doc_id", "full_outer")
    contribs = [
        F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i}")),
        ).otherwise(F.lit(0.0))
        for i in range(len(rankings))
    ]
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    rrf_q = F.floor(total * F.lit(float(_RRF_Q)) + F.lit(0.5)).cast("long")
    out = fused.select(
        "doc_id",
        rrf_q.alias("rrf_q"),
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(0)).cast("long").alias(f"rank_{i}")
            for i in range(len(rankings))
        ],
    )
    return out.orderBy(F.desc("rrf_q"), F.asc("doc_id")).limit(topk)


def rrf_hybrid_topk(
    searcher,
    emb: DataFrame,
    term: str,
    query_vec_id: int,
    k_each: int = 20,
    rrf_k: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """BM25 ⊕ cosine hybrid: the term query's quantized-BM25 top-k_each
    and the stored vector's exact-cosine top-k_each, RRF-fused. vec_id is
    the corpus doc_id (the embeddings table is row-aligned with
    documents)."""
    from lucenenet_spark.functions.similarity import cosine_topk
    from lucenenet_spark.search.queries import TermQuery

    lex_scored = searcher.scored(TermQuery(term)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )
    lex_top = lex_scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(k_each)
    sem_top = cosine_topk(emb, query_vec_id, k=k_each).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return rrf_fuse(
        [ranked(lex_top, "score_q"), ranked(sem_top, "cos_q")],
        k=rrf_k,
        topk=topk,
    )


def combmnz_fusion(
    ranking_a: DataFrame, ranking_b: DataFrame, k: int = 10, quantum: float = 1e6
) -> DataFrame:
    """CombMNZ score fusion (Fox & Shaw, "Combination of multiple
    searches", TREC-2 1994): min-max normalize each system's scores
    over its own top-k, sum them, and multiply by the number of systems
    that retrieved the document — the classic unsupervised fusion that
    RRF later simplified (rank-only); CombMNZ keeps score magnitudes,
    which helps when one system's margins are informative.

    Inputs: (doc_id, rank, score_q) top-k frames (quantized scores, as
    the engine's collectors emit).  Normalization runs on the exact
    integer score_q against integer per-system min/max (single-doc
    systems normalize to 1.0); the fused value is quantized back to a
    bigint.  Output: (rank, doc_id, n_systems, fused_q), ordered
    (fused_q DESC, doc_id ASC).
    """
    from pyspark.sql import Window

    def _norm(r: DataFrame, side: str) -> DataFrame:
        r = r.filter(F.col("rank") <= k).select(
            "doc_id", F.col("score_q").alias("s")
        )
        mm = r.agg(
            F.min("s").alias("lo"), F.max("s").alias("hi")
        )
        return r.crossJoin(F.broadcast(mm)).select(
            "doc_id",
            F.when(F.col("hi") == F.col("lo"), F.lit(1.0))
            .otherwise(
                (F.col("s") - F.col("lo")).cast("double")
                / (F.col("hi") - F.col("lo")).cast("double")
            )
            .alias(f"n_{side}"),
        )
    a = _norm(ranking_a, "a")
    b = _norm(ranking_b, "b")
    fused = a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("n_a", F.lit(0.0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0.0)).alias("n_b"),
    )
    pres_a = ranking_a.filter(F.col("rank") <= k).select(
        "doc_id", F.lit(1).alias("in_a")
    )
    pres_b = ranking_b.filter(F.col("rank") <= k).select(
        "doc_id", F.lit(1).alias("in_b")
    )
    pres = pres_a.join(pres_b, "doc_id", "full_outer").select(
        "doc_id",
        (F.coalesce("in_a", F.lit(0)) + F.coalesce("in_b", F.lit(0)))
        .cast("long")
        .alias("n_systems"),
    )
    out = (
        fused.join(pres, "doc_id")
        .select(
            "doc_id",
            "n_systems",
            F.floor(
                F.col("n_systems").cast("double")
                * (F.col("n_a") + F.col("n_b"))
                * F.lit(quantum)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("fused_q"),
        )
    )
    w = Window.orderBy(F.desc("fused_q"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "n_systems", "fused_q"
    )


def borda_fuse(
    rankings: list[DataFrame], k: int = 10, topk: int = 10
) -> DataFrame:
    """Borda-count rank fusion (Aslam & Montague, "Models for
    Metasearch", SIGIR 2001 — the positional-voting baseline every
    fusion paper compares against): each list awards a document
    ``k - rank + 1`` points (its Borda score as a voter with k
    preferences); unranked documents get 0 from that list.  Total
    points DESC, doc_id ASC.  Pure integers — no normalization step,
    which is exactly why Borda is the robust default when the input
    scores are incomparable (BM25 vs embedding distances vs clicks).

    Input frames carry (doc_id, rank<=k); output (rank, doc_id,
    points, rank_0, rank_1, ...).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1 or topk < 1:
        raise ValueError(f"need k >= 1 and topk >= 1, got k={k} topk={topk}")
    fused = None
    for i, r in enumerate(rankings):
        r = r.filter(F.col("rank") <= k).select(
            "doc_id", F.col("rank").alias(f"rank_{i}")
        )
        fused = r if fused is None else fused.join(r, "doc_id", "full_outer")
    points = None
    for i in range(len(rankings)):
        c = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(k + 1) - F.col(f"rank_{i}"),
        ).otherwise(F.lit(0))
        points = c if points is None else points + c
    out = fused.select(
        "doc_id",
        points.cast("long").alias("points"),
        *[
            F.coalesce(F.col(f"rank_{i}"), F.lit(0)).cast("long").alias(f"rank_{i}")
            for i in range(len(rankings))
        ],
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("points"), F.asc("doc_id"))
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("rank", "doc_id", "points",
                *[f"rank_{i}" for i in range(len(rankings))])
    )


def condorcet_fuse(rankings: list[DataFrame], topk: int = 10) -> DataFrame:
    """Condorcet rank fusion scored by the Copeland method (Montague &
    Aslam, "Condorcet Fusion for Improved Retrieval", CIKM'02 — the
    pairwise-majority aggregation RRF's own paper benchmarks against).

    Candidates are the union of all input lists; within each system a
    document absent from the list ranks below every present document
    (and ties with the other absentees).  For every candidate pair the
    systems vote by rank; d BEATS e if a strict majority of systems
    rank d better.  The Copeland score 2*wins + ties is a pure integer
    — no score normalization, no floats anywhere.

    Input frames carry (doc_id, rank); output (doc_id, copeland_2x,
    wins, ties) top-`topk` by (copeland_2x DESC, doc_id ASC).  Scale:
    the pair matrix is |union|^2 * S rows where |union| <= S*k — fusion
    metadata, independent of corpus size.
    """
    if len(rankings) < 2:
        raise ValueError("condorcet_fuse needs at least 2 rankings")
    big = 1 << 40
    u = None
    for i, r in enumerate(rankings):
        r = r.select("doc_id", F.col("rank").cast("long").alias("rank"),
                     F.lit(i).alias("sys"))
        u = r if u is None else u.unionByName(r)
    cands = u.select("doc_id").distinct()
    systems = u.select("sys").distinct()
    m = (
        cands.crossJoin(systems)
        .join(u, ["doc_id", "sys"], "left")
        .select("doc_id", "sys", F.coalesce("rank", F.lit(big)).alias("r"))
    )
    a = m.select(F.col("doc_id").alias("doc_a"), "sys", F.col("r").alias("ra"))
    b = m.select(F.col("doc_id").alias("doc_b"), "sys", F.col("r").alias("rb"))
    votes = (
        a.join(b, "sys")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.when(F.col("ra") < F.col("rb"), 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("rb") < F.col("ra"), 1).otherwise(0)).alias("nb"),
        )
    )
    per = votes.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.sum(F.when(F.col("na") > F.col("nb"), 1).otherwise(0))
        .cast("long")
        .alias("wins"),
        F.sum(F.when(F.col("na") == F.col("nb"), 1).otherwise(0))
        .cast("long")
        .alias("ties"),
    )
    from pyspark.sql import Window

    out = per.select(
        "doc_id",
        (F.lit(2) * F.col("wins") + F.col("ties")).cast("long").alias("copeland_2x"),
        "wins",
        "ties",
    )
    w = Window.orderBy(F.desc("copeland_2x"), F.asc("doc_id"))
    return (
        out.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= topk)
        .drop("_r")
    )
