"""SemDeDup: semantic deduplication via k-means-bounded cosine pairs.

Published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): cluster
the embedding space with k-means, call two documents semantic duplicates
when their cosine similarity within the SAME cluster exceeds epsilon, and
keep exactly the member of each duplicate relation with the LOWEST cosine
similarity to its cluster centroid (the paper's choice — it preserves the
"edge" examples and discards the prototypical ones).

This is the scale story that distinguishes SemDeDup from the global
embedding-cosine near-dup pass (functions/dedup.embedding_near_duplicates):
the pair join is bounded to within-cluster, so with k clusters the
candidate cost drops from N^2 to roughly N^2/k — the paper runs k ~ 11k
clusters over LAION-440M. Here the coarse quantizer is the repo's trained
spherical k-means (functions/similarity.train_ivf_centroids — unit-norm
centroids, argmax-dot == cosine-nearest, ties to smallest cid), shared
with the IVF/IVFPQ ANN paths so one trained codebook serves both ANN and
semantic dedup.

Everything is pure Column arithmetic (sequential-fold dots, BIGINT 1e-4
quantization at every comparison boundary) so a DuckDB oracle can
reproduce the exact survivor set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.similarity import _dot_lit

_Q = 10000


def _csim_q(best_dot, vec_col: str):
    """Quantized cosine to the ASSIGNED (unit-norm) centroid: the winning
    raw dot divided by |v|."""
    n2 = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(best_dot / F.sqrt(n2) * F.lit(float(_Q)) + F.lit(0.5)).cast("long")


def semdedup_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding, cid, csim_q): cluster id (argmax raw dot over
    unit-norm centroids, ties to smallest cid — ivf_assign's convention)
    plus the quantized cosine-to-own-centroid used as the keep priority.
    One narrow scan, no shuffle."""
    dots = [_dot_lit(vec_col, c) for c in centroids]
    best = F.greatest(*dots)
    cid = F.coalesce(
        *[F.when(dots[c] == best, F.lit(c)) for c in range(len(centroids))]
    )
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        cid.alias("cid"),
        _csim_q(best, vec_col).alias("csim_q"),
    )


def _pair_cos_q(a_vec, b_vec):
    def fold(prod):
        return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)

    dot = fold(F.zip_with(a_vec, b_vec, lambda x, y: x.cast("double") * y))
    n2a = fold(F.zip_with(a_vec, a_vec, lambda x, y: x.cast("double") * y))
    n2b = fold(F.zip_with(b_vec, b_vec, lambda x, y: x.cast("double") * y))
    return F.floor(dot / F.sqrt(n2a * n2b) * F.lit(float(_Q)) + F.lit(0.5)).cast(
        "long"
    )


def semdedup_removed(
    assigned: DataFrame,
    threshold: float,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """(vec_id): documents SemDeDup removes. x is removed iff some same-
    cluster y has quantized cos(x, y) >= round(threshold*1e4) AND y beats
    x in the keep order (lower csim_q, ties to smaller vec_id). The
    minimum of every duplicate clique survives by construction, matching
    the paper's keep-farthest-from-centroid rule pairwise-deterministically.

    Clusters larger than `max_cluster_size` are excluded from pairing
    entirely (all members kept — conservative): at web scale an over-cap
    cluster means the quantizer is under-trained for that region, and a
    quadratic join there is the one blow-up this operator must never do.
    The paper's own defense is the same shape (more clusters)."""
    thresh_q = int(round(threshold * _Q))
    slim = assigned.select("vec_id", "embedding", "cid", "csim_q")
    if max_cluster_size is not None:
        ok = (
            slim.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_cluster_size)
            .select("cid")
        )
        slim = slim.join(ok, "cid")
    a = slim.alias("a")
    b = slim.alias("b")
    beats = (F.col("b.csim_q") < F.col("a.csim_q")) | (
        (F.col("b.csim_q") == F.col("a.csim_q"))
        & (F.col("b.vec_id") < F.col("a.vec_id"))
    )
    return (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .filter(beats)
        .filter(_pair_cos_q(F.col("a.embedding"), F.col("b.embedding")) >= thresh_q)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.35,
    *,
    n_cells: int = 16,
    seed: int = 7,
    centroids: list[list[float]] | None = None,
    max_cluster_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup survivors: (vec_id, cid, csim_q) for every document kept
    after within-cluster semantic dedup at `threshold`. See module
    docstring for the algorithm and the scale shape."""
    from lucenenet_spark.functions.similarity import trained_ivf_centroids

    cents = (
        centroids if centroids is not None else trained_ivf_centroids(n_cells, seed)
    )
    assigned = semdedup_assign(emb, cents, id_col=id_col, vec_col=vec_col)
    removed = semdedup_removed(assigned, threshold, max_cluster_size)
    return assigned.join(removed, "vec_id", "left_anti").select(
        "vec_id", "cid", "csim_q"
    )
