"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Brute-force is the exactness baseline (one scan + TakeOrdered — fine when
the query side is small). The scale path is random-hyperplane LSH: vectors
hash to sign-pattern buckets; a query probes only its bucket — candidate
generation drops from O(N) to O(bucket), at recall < 1. Both are pure
DataFrame plans (posexplode + join + groupBy sum), no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exploded(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("i", "v0"),
    ).select("vec_id", "i", F.col("v0").cast("double").alias("v"))


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of one stored vector against the collection.

    Returns (vec_id, cos_q) with cos_q = floor(cos*10000+0.5) as bigint,
    ordered cos_q DESC, vec_id ASC (deterministic tie-break) — the
    HitQueue contract applied to similarity search.
    """
    e = _exploded(emb, id_col, vec_col)
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        "i", F.col("v").alias("qv")
    )
    d = (
        e.join(F.broadcast(q), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("v") * F.col("qv")).alias("dot"),
            F.sum(F.col("v") * F.col("v")).alias("n2"),
        )
    )
    qn2 = q.agg(F.sum(F.col("qv") * F.col("qv")).alias("n2")).collect()[0]["n2"]
    cos = F.col("dot") / F.sqrt(F.col("n2") * F.lit(float(qn2)))
    cos_q = F.floor(cos * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        d.select("vec_id", cos_q.alias("cos_q"))
        .orderBy(F.desc("cos_q"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_arrays(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k against a literal query vector using zip_with/aggregate —
    single narrow scan, no explode shuffle (the 100 TB-friendly shape:
    per-row dot product inside whole-stage codegen + TakeOrdered(k))."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n2 = F.aggregate(
        F.transform(F.col(vec_col), lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn2 = float(sum(float(x) * float(x) for x in query))
    cos = dot / F.sqrt(n2 * F.lit(qn2))
    return (
        emb.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def random_hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern LSH bucket id per vector (SimHash for dense vectors).

    Hyperplanes are a deterministic pseudo-random matrix derived from the
    seed (xorshift-free: sin-based low-discrepancy values), so bucketing is
    reproducible across runs and cluster sizes.
    """
    import math

    planes = [
        [math.sin(seed * 1000003 + p * 10007 + i) for i in range(dim)] for p in range(n_planes)
    ]
    e = _exploded(emb, id_col, vec_col)
    plane_lits = [
        F.element_at(F.array(*[F.lit(x) for x in plane]), F.col("i") + 1) for plane in planes
    ]
    dots = e.groupBy("vec_id").agg(
        *[F.sum(F.col("v") * pl).alias(f"d{p}") for p, pl in enumerate(plane_lits)]
    )
    bucket = F.concat(*[F.when(F.col(f"d{p}") >= 0, "1").otherwise("0") for p in range(n_planes)])
    return dots.select("vec_id", bucket.alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    cosine within the candidate set (IVF-style two-stage search)."""
    buckets = random_hyperplane_buckets(emb, n_planes, seed, dim)
    qb = buckets.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cands = buckets.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket")).select("vec_id")
    sub = emb.join(cands, "vec_id")
    return cosine_topk(sub, query_vec_id, k)
