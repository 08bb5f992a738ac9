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

from lucenenet_spark.functions._tracked import RoundScope

_KCENTER_SCOPE = RoundScope()


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


def cosine_col(query: list[float], vec_col: str = "embedding"):
    """Per-row cosine(vec, query) as a codegen'd Column: zip_with/aggregate
    dot product over the array — no explode, no shuffle."""
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
    return dot / F.sqrt(n2 * F.lit(qn2))


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
    return (
        emb.select(F.col(id_col).alias("vec_id"), cosine_col(query, vec_col).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_arrays_q(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """cosine_topk_arrays with the similarity quantized to a bigint
    (floor(cos*10000+0.5)) and the total order applied on the QUANTIZED
    value — engine-deterministic top-k for oracle comparison."""
    cos_q = F.floor(cosine_col(query, vec_col) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        emb.select(F.col(id_col).alias("vec_id"), cos_q.alias("cos_q"))
        .orderBy(F.desc("cos_q"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplanes(n_planes: int = 8, seed: int = 42, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix derived from the seed
    (sin-based low-discrepancy values) — reproducible across runs, cluster
    sizes, and engines (the SQL oracle embeds the same literals)."""
    import math

    return [
        [math.sin(seed * 1000003 + p * 10007 + i) for i in range(dim)] for p in range(n_planes)
    ]


def random_hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern LSH bucket id per vector (SimHash for dense vectors).

    One narrow scan: each plane's dot product is a codegen'd
    zip_with/aggregate fold over the embedding array — deterministic
    accumulation order (unlike an explode + groupBy sum), no shuffle."""
    planes = hyperplanes(n_planes, seed, dim)

    def dot(plane: list[float]):
        qlit = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = F.concat(
        *[F.when(dot(plane) >= 0, "1").otherwise("0") for plane in planes]
    )
    return emb.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    n_probes: int = 1,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket (plus, with
    multi-probe, the Hamming-neighbor buckets of the query's sign pattern —
    the buckets a near-boundary vector most likely fell into), then exact
    cosine within the candidate set (IVF-style two-stage search).

    n_probes=1 probes only the home bucket; n_probes=2 adds all n_planes
    Hamming-1 buckets; n_probes=3 adds Hamming-2, etc. Recall grows with
    probes at candidate-set cost O(n_buckets_probed x avg bucket size) —
    never a full scan.
    """
    from itertools import combinations

    buckets = random_hyperplane_buckets(emb, n_planes, seed, dim)
    qrow = buckets.filter(F.col("vec_id") == query_vec_id).select("bucket").collect()
    if not qrow:
        return emb.select(
            F.col("vec_id"),
            (F.lit(0).cast("long") if quantized else F.lit(0.0)).alias(
                "cos_q" if quantized else "cos"
            ),
        ).limit(0)
    qb = qrow[0]["bucket"]
    probes = {qb}
    for radius in range(1, n_probes):
        for flips in combinations(range(len(qb)), radius):
            cand = list(qb)
            for p in flips:
                cand[p] = "1" if cand[p] == "0" else "0"
            probes.add("".join(cand))
    cands = buckets.filter(F.col("bucket").isin(sorted(probes))).select("vec_id")
    # left-semi, no forced broadcast: a bucket holds ~N/2^n_planes vectors —
    # corpus-sized, not driver-sized. AQE broadcasts only when actually small;
    # at 10^9+ vectors raise n_planes (default 16 ≈ 65k buckets) so buckets
    # stay join-friendly.
    sub = emb.join(cands, "vec_id", "left_semi")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()[0][0]
    ]
    if quantized:
        return cosine_topk_arrays_q(sub, qvec, k)
    return cosine_topk_arrays(sub, qvec, k)


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> posting lists per centroid
# -> probe top-nprobe centroids -> exact cosine within candidates.
# The FAISS IVF-Flat shape re-expressed as DataFrame ops; complements the
# hyperplane-LSH path (LSH: data-independent buckets; IVF: centroid cells
# whose size tracks data density).
# --------------------------------------------------------------------------
def ivf_centroids(n_centroids: int = 16, seed: int = 7, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random centroids (sin-based, like
    hyperplanes()) — a data-independent coarse quantizer whose literals the
    SQL oracle can embed. Untrained fallback: at real data density its
    cells are arbitrarily unbalanced; prefer train_ivf_centroids /
    trained_ivf_centroids, which drop into the same seam (every downstream
    op is quantizer-agnostic)."""
    import math

    return [
        [math.sin(seed * 999983 + c * 20011 + i) for i in range(dim)]
        for c in range(n_centroids)
    ]


def train_ivf_centroids(
    vectors, n_centroids: int = 16, seed: int = 7, iters: int = 10
) -> list[list[float]]:
    """Deterministic seeded spherical k-means (the FAISS IVF training
    step): seeded init from the sample, fixed Lloyd iterations, unit-norm
    centroids so argmax-dot assignment (ivf_assign) is cosine-nearest.
    Pure numpy on a bounded in-memory sample — same determinism contract
    as the rest of the oracle arithmetic (ties in argmax go to the
    smallest cid on both sides). Empty cells keep their previous centroid
    (deterministic, no resampling)."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    rng = np.random.default_rng(seed)
    init = np.sort(rng.choice(len(x), size=n_centroids, replace=False))
    cents = x[init].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = x[m].sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return [[float(v) for v in c] for c in cents]


# Pinned reference sample for offline quantizer training: the canonical
# smallest-sf embeddings table. Training reads it DRIVER-side via pyarrow
# (bounded rows, no Spark job) — the FAISS practice of training the coarse
# quantizer on a sample, then broadcasting centroids to the fleet. The
# resulting python-float literals embed identically into Spark Column
# expressions and DuckDB oracle SQL.
CANONICAL_TRAIN_PATH = "/root/testdata/sf0.001/embeddings.parquet"
_TRAINED_CACHE: dict[tuple, list[list[float]]] = {}


def trained_ivf_centroids(
    n_centroids: int = 16,
    seed: int = 7,
    iters: int = 10,
    sample_path: str | None = None,
    max_rows: int = 512,
) -> list[list[float]]:
    """Trained coarse quantizer: deterministic k-means over the first
    `max_rows` vec_id-ordered rows of the pinned sample. Falls back to the
    data-independent sin() centroids only when the sample file is absent
    (so imports stay robust outside the test environment)."""
    import os

    path = sample_path or CANONICAL_TRAIN_PATH
    key = (path, n_centroids, seed, iters, max_rows)
    if key not in _TRAINED_CACHE:
        if not os.path.exists(path):
            _TRAINED_CACHE[key] = ivf_centroids(n_centroids, seed)
        else:
            import pyarrow.parquet as pq

            t = pq.read_table(path, columns=["vec_id", "embedding"])
            import numpy as np

            order = np.argsort(t.column("vec_id").to_numpy())[:max_rows]
            embs = t.column("embedding").to_pylist()
            sample = np.array([embs[i] for i in order], dtype=np.float64)
            _TRAINED_CACHE[key] = train_ivf_centroids(
                sample, n_centroids=n_centroids, seed=seed, iters=iters
            )
    return _TRAINED_CACHE[key]


def _dot_lit(vec_col: str, vals: list[float]):
    """Sequential-fold dot product with a literal vector (deterministic
    accumulation order -> bit-identical to the oracle's sequential sum)."""
    qlit = F.array(*[F.lit(float(x)) for x in vals])
    return F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid): nearest centroid by max dot product, ties to the
    smallest cid (first-match CASE chain — same convention in the oracle).
    Pure Column expressions; one narrow scan, no shuffle."""
    dots = [_dot_lit(vec_col, c) for c in centroids]
    best = F.greatest(*dots)
    cid = F.coalesce(
        *[F.when(dots[c] == best, F.lit(c)) for c in range(len(centroids))]
    )
    return emb.select(F.col(id_col).alias("vec_id"), cid.alias("cid"))


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 7,
    dim: int = 64,
    quantized: bool = False,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN: assign every vector to its centroid cell, probe the
    query's top-nprobe cells, exact cosine inside them. Candidate cost is
    O(nprobe * N / n_centroids); at 10^9+ vectors raise n_centroids so
    cells stay shuffle-join-friendly (same guidance as LSH n_planes).

    `centroids` plugs in a trained quantizer (trained_ivf_centroids);
    default falls back to the data-independent sin() cells."""
    cents = centroids if centroids is not None else ivf_centroids(n_centroids, seed, dim)
    n_centroids = len(cents)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()[0][0]
    ]
    qd = [sum(a * b for a, b in zip(qvec, c)) for c in cents]  # sequential sum
    probes = sorted(range(n_centroids), key=lambda c: (-qd[c], c))[:nprobe]
    cand = (
        ivf_assign(emb, cents)
        .filter(F.col("cid").isin(probes))
        .select("vec_id")
    )
    sub = emb.join(cand, "vec_id", "left_semi")
    if quantized:
        return cosine_topk_arrays_q(sub, qvec, k)
    return cosine_topk_arrays(sub, qvec, k)


# --------------------------------------------------------------------------
# SQ8: symmetric int8 scalar quantization (the FAISS ScalarQuantizer
# QT_8bit shape) — integer shortlist + exact re-rank
# --------------------------------------------------------------------------
def sq8_quantize(vals: list[float]) -> tuple[list[int], int]:
    """Driver-side twin of the executor quantization: per-vector scale
    127/max|x|, q_i = floor(x_i * s + 0.5); returns (ints, sum q_i^2)."""
    import math

    m = max(max(abs(float(x)) for x in vals), 1e-30)
    s = 127.0 / m
    q = [int(math.floor(float(x) * s + 0.5)) for x in vals]
    return q, sum(v * v for v in q)


def sq8_ann_topk(
    emb: DataFrame,
    query: list[float],
    n_shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized ANN: shortlist by int8 cosine, exact re-rank.

    Each vector is quantized to int8 with a per-vector symmetric scale
    (127/max|x|). The shortlist metric is the all-integer cosine
    sum(qa*qb) / sqrt(sum(qa^2) * sum(qb^2)) — the per-vector scales
    cancel, so no float state is stored beside the codes. At 100 TB
    this is the classic memory/bandwidth trade: 4x smaller vectors
    scanned in whole-stage codegen (zip_with/aggregate, no UDF), then
    only ``n_shortlist`` rows touch the full-precision embeddings for
    the exact re-rank. Returns (vec_id, cos8_q, cos_q) ordered by the
    exact quantized cosine."""
    qq, qn2 = sq8_quantize(query)
    qlit = F.array(*[F.lit(int(v)) for v in qq])
    mx = F.greatest(
        F.expr(f"array_max(transform({vec_col}, x -> abs(x)))"),
        F.lit(1e-30),
    )
    qvec = F.expr(
        f"transform({vec_col}, x -> CAST(floor(x * (127.0 / _m) + 0.5) AS BIGINT))"
    )
    coded = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col), mx.alias("_m")
    ).select("vec_id", vec_col, qvec.alias("_q"))
    dot_i = F.expr(
        "aggregate(zip_with(_q, _qq, (a, b) -> a * b), CAST(0 AS BIGINT),"
        " (acc, x) -> acc + x)"
    )
    n2_i = F.expr(
        "aggregate(_q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
    )
    scored = coded.withColumn("_qq", qlit).select(
        "vec_id",
        vec_col,
        F.floor(
            dot_i / F.sqrt(n2_i.cast("double") * F.lit(float(qn2)))
            * F.lit(10000.0)
            + F.lit(0.5)
        ).cast("long").alias("cos8_q"),
    )
    short = scored.orderBy(F.desc("cos8_q"), F.asc("vec_id")).limit(n_shortlist)
    exact_q = F.floor(
        cosine_col(query, vec_col) * F.lit(10000.0) + F.lit(0.5)
    ).cast("long")
    return (
        short.select("vec_id", "cos8_q", exact_q.alias("cos_q"))
        .orderBy(F.desc("cos_q"), F.asc("vec_id"))
        .limit(k)
    )


def sparse_cosine_pairs(
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    df_cap: int,
    k: int = 50,
    field: str | None = None,
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity over the inverted index
    (Bayardo, Ma & Srikant WWW'07 "Scaling Up All Pairs Similarity
    Search"): candidate pairs come from joining the postings list with
    itself PER TERM, so two documents meet only where they share a term
    — never a corpus cross-join.

    Scale levers (the WWW'07 insight, re-expressed Spark-first):
    - ``df_cap`` prunes hot terms BEFORE the self-join — a term with
      document frequency df yields df^2 candidate rows, so dropping
      stopword-scale terms bounds the quadratic blow-up exactly like
      the paper's prefix filter / the minhash gate's max_bucket_size.
    - The self-join shuffles on ``term`` (both sides already grouped),
      then ONE groupBy(a, b) aggregates dot products; norms are a
      broadcastable per-doc aggregate.

    Determinism (gate oracle): weights are QUANTIZED to bigints first
    (wq = floor(tf * (ln(n/(df+1)) + 1) * 1000 + 0.5)); dots and
    squared norms are exact integer sums, and only the final
    dot/sqrt(na2)/sqrt(nb2) runs in double — identical IEEE ops on
    identical integers in both engines.

    Returns top-k (doc_a, doc_b, cos_q) by quantized cosine.
    """
    fld_post = postings
    if field is not None:
        fld_post = postings.filter(F.col("field") == field)
        term_stats = term_stats.filter(F.col("field") == field)
    w = (
        fld_post.select("doc_id", "term", "tf")
        .join(term_stats.filter(F.col("df") <= df_cap).select("term", "df"), "term")
        .select(
            "doc_id",
            "term",
            F.floor(
                F.col("tf")
                * (F.log(F.lit(float(n_docs)) / (F.col("df") + 1)) + F.lit(1.0))
                * F.lit(1000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("wq"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("wq") * F.col("wq")).cast("long").alias("n2")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.sum(F.col("a.wq") * F.col("b.wq")).cast("long").alias("dot"))
    )
    cos = (
        dots.join(norms.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n2", "na2"), "doc_a")
        .join(norms.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n2", "nb2"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.floor(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cos_q"),
        )
    )
    return cos.orderBy(F.desc("cos_q"), F.asc("doc_a"), F.asc("doc_b")).limit(k)


# -------------------------------------------------------------------- JL
def jl_signs(d_in: int, d_out: int) -> list[tuple[int, int, int]]:
    """Deterministic Achlioptas sign matrix: s_ij = +-1 from the parity
    of the first md5 hex digit of "i#j" — the single source of truth
    both the Spark plan and any oracle replay (minhash_perms
    convention)."""
    import hashlib

    out = []
    for i in range(d_in):
        for j in range(d_out):
            h = hashlib.md5(f"{i}#{j}".encode()).hexdigest()
            out.append((i, j, 1 if int(h[0], 16) % 2 == 0 else -1))
    return out


def jl_project_q(
    emb: DataFrame, d_out: int = 16, id_col: str = "vec_id", quantum: float = 1024.0
) -> DataFrame:
    """Johnson-Lindenstrauss random projection with Achlioptas ±1 signs
    (Achlioptas, "Database-friendly random projections", JCSS 2003):
    y_j = Σ_i x_i·s_ij, preserving pairwise distances within 1±ε at
    d_out = O(log n / ε²) — the standard dimensionality cut before ANN
    indexing when 64-1536-d embeddings are too wide to bucket.

    Determinism contract: components are quantized FIRST
    (xq = floor(x·1024 + 0.5) — ·1024 is a power of two, so the
    float32→double→quantize path is exact in any engine), then every
    projection is an exact INTEGER sum — order-independent, no float
    accumulation anywhere.  Returns (vec_id, j, yq).

    Scale shape: explode to (row, i, xq) + broadcast sign join +
    groupBy(vec_id, j) integer sum here (exactness over elegance); at
    10^9 rows the same quantized matrix runs as an Arrow-batched
    matmul in mapInArrow with identical outputs.
    """
    d_in = len(emb.select("embedding").head()[0])
    signs = emb.sparkSession.createDataFrame(
        jl_signs(d_in, d_out), "i int, j int, s int"
    )
    comps = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("x").cast("double") * F.lit(quantum) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
    )
    return (
        comps.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("xq") * F.col("s")).cast("long").alias("yq"))
    )


def jl_distance_audit(
    emb: DataFrame, d_out: int = 16, n_pairs: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """JL distance-preservation audit against vec 0: for b = 1..n_pairs,
    (vec_b, d2_orig, d2_proj, ratio_q4) with ratio =
    sqrt(d2_proj / d_out) / sqrt(d2_orig) ≈ 1 ± ε — exact integer
    squared distances, one double formula at the end."""
    d_in = len(emb.select("embedding").head()[0])
    proj = jl_project_q(emb, d_out=d_out, id_col=id_col)
    pa = proj.filter(F.col("vec_id") == 0).select("j", F.col("yq").alias("ya"))
    pb = proj.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= n_pairs)
    ).select(F.col("vec_id").alias("vec_b"), "j", F.col("yq").alias("yb"))
    d2p = (
        pb.join(pa, "j")
        .groupBy("vec_b")
        .agg(
            F.sum((F.col("yb") - F.col("ya")) * (F.col("yb") - F.col("ya")))
            .cast("long")
            .alias("d2_proj")
        )
    )
    comps = emb.select(
        F.col(id_col).alias("vec_id"), F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("x").cast("double") * F.lit(1024.0) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
    )
    ca = comps.filter(F.col("vec_id") == 0).select("i", F.col("xq").alias("xa"))
    cb = comps.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= n_pairs)
    ).select(F.col("vec_id").alias("vec_b"), "i", F.col("xq").alias("xb"))
    d2o = (
        cb.join(ca, "i")
        .groupBy("vec_b")
        .agg(
            F.sum((F.col("xb") - F.col("xa")) * (F.col("xb") - F.col("xa")))
            .cast("long")
            .alias("d2_orig")
        )
    )
    ratio = F.when(
        F.col("d2_orig") > 0,
        F.floor(
            F.sqrt(F.col("d2_proj").cast("double") / F.lit(float(d_out)))
            / F.sqrt(F.col("d2_orig").cast("double"))
            * F.lit(1e4)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(10000).cast("long"))  # zero distance preserved exactly
    return (
        d2o.join(d2p, "vec_b")
        .select("vec_b", "d2_orig", "d2_proj", ratio.alias("ratio_q4"))
        .orderBy("vec_b")
    )


def dim_prefix_overlap(
    emb: DataFrame,
    query: list[float],
    prefix_dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka prefix-dimension retrieval audit (Kusupati et al.,
    "Matryoshka Representation Learning", NeurIPS 2022): how much of
    the exact top-k survives when ranking uses only the first
    ``prefix_dim`` dimensions — the coarse-to-fine trick that lets a
    100 TB ANN tier scan short prefixes and rerank the survivors with
    full vectors.

    One row: (k, prefix_dim, overlap) with overlap = |top-k(full) ∩
    top-k(prefix)| on the quantized-cosine total order.  Both rankings
    are the narrow zip_with/aggregate scan of cosine_topk_arrays_q;
    the prefix side slices the stored array in the scan itself, so no
    second materialized copy of the vectors exists.
    """
    if not 0 < prefix_dim <= len(query):
        raise ValueError("prefix_dim must be in (0, len(query)]")
    full = cosine_topk_arrays_q(emb, query, k, id_col=id_col, vec_col=vec_col)
    sliced = emb.select(
        F.col(id_col).alias(id_col), F.slice(F.col(vec_col), 1, prefix_dim).alias(vec_col)
    )
    pre = cosine_topk_arrays_q(sliced, query[:prefix_dim], k, id_col=id_col, vec_col=vec_col)
    ov = full.select("vec_id").join(pre.select("vec_id"), "vec_id", "left_semi")
    return ov.agg(F.count(F.lit(1)).cast("long").alias("overlap")).select(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(int(prefix_dim)).cast("long").alias("prefix_dim"),
        "overlap",
    )


def _quantized_components(
    emb: DataFrame, id_col: str, vec_col: str, comp_scale: int
) -> DataFrame:
    """(vec_id, i, vq): per-component integer quantization vq =
    floor(v * comp_scale + 0.5) — ONE IEEE op per component, identical
    in any engine, after which every distance is exact bigint
    arithmetic (integer sums are aggregation-order-free, unlike double
    sums).  The determinism workhorse for kcenter_select /
    loo_1nn_errors."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("i", "v"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("v").cast("double") * F.lit(float(comp_scale)) + F.lit(0.5))
        .cast("long")
        .alias("vq"),
    )


def kcenter_select(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    comp_scale: int = 1000,
) -> DataFrame:
    """Gonzalez (1985) farthest-first traversal — the k-center
    2-approximation, the classic max-min diversity coreset for
    training-data selection: seed with the smallest id, then k-1 times
    add the point whose minimum squared distance to the chosen set is
    LARGEST (ties: smallest id).  Distances are exact bigints over
    component-quantized vectors (see _quantized_components), so the
    selection is bit-deterministic on any engine.

    Output one row per round: (round, vec_id, maxmin_d2) — round 1 is
    the seed with maxmin_d2 = 0; each later row's maxmin_d2 is the
    coverage radius just before that center was added (non-increasing,
    the 2-approximation certificate).

    Scale: each round is one (N x round)-pair distance aggregation —
    the chosen set (<= k rows) broadcasts, the corpus is scanned k
    times, never joined with itself.  No driver collect.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    _KCENTER_SCOPE.begin()
    eq = _KCENTER_SCOPE.track(
        _quantized_components(emb, id_col, vec_col, comp_scale)
    )
    seed = (
        eq.groupBy("vec_id")
        .agg(F.count("*").alias("_n"))
        .select(F.min("vec_id").cast("long").alias("vec_id"))
    )
    chosen = seed
    out = seed.select(
        F.lit(1).cast("long").alias("round"),
        "vec_id",
        F.lit(0).cast("long").alias("maxmin_d2"),
    )
    for r in range(2, k + 1):
        ch = (
            eq.join(
                F.broadcast(chosen.select(F.col("vec_id").alias("cid"))),
                F.col("vec_id") == F.col("cid"),
            )
            .select(F.col("cid"), "i", F.col("vq").alias("cq"))
        )
        winner = (
            eq.join(chosen.select("vec_id"), "vec_id", "left_anti")
            .join(F.broadcast(ch), "i")
            .groupBy("vec_id", "cid")
            .agg(
                F.sum((F.col("vq") - F.col("cq")) * (F.col("vq") - F.col("cq")))
                .cast("long")
                .alias("d2")
            )
            .groupBy("vec_id")
            .agg(F.min("d2").cast("long").alias("maxmin_d2"))
            .orderBy(F.desc("maxmin_d2"), F.asc("vec_id"))
            .limit(1)
        )
        winner = _KCENTER_SCOPE.track(winner)
        chosen = chosen.unionByName(winner.select("vec_id"))
        out = out.unionByName(
            winner.select(
                F.lit(r).cast("long").alias("round"), "vec_id", "maxmin_d2"
            )
        )
    return out


def loo_1nn_errors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    comp_scale: int = 1000,
) -> DataFrame:
    """Leave-one-out 1-nearest-neighbour label error per class (Cover &
    Hart 1967's classifier as an embedding-quality probe): each vector's
    nearest OTHER vector by exact squared distance over quantized
    components (ties: smallest id); an error when the labels differ.
    Output per label: (label, n, errors, err_ppm) — all exact integers.

    Scale: this is the brute-force all-pairs twin (the banded-LSH / IVF
    gates are the production path); the pair frame is the exploded
    component join, integer-summed, so the result is engine-exact.
    """
    from pyspark.sql import Window

    eq = _quantized_components(emb, id_col, vec_col, comp_scale)
    a = eq.select(F.col("vec_id").alias("va"), "i", F.col("vq").alias("qa"))
    b = eq.select(F.col("vec_id").alias("vb"), "i", F.col("vq").alias("qb"))
    d2 = (
        a.join(b, "i")
        .filter(F.col("va") != F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb")))
            .cast("long")
            .alias("d2")
        )
    )
    w = Window.partitionBy("va").orderBy(F.asc("d2"), F.asc("vb"))
    nn = (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("va", "vb")
    )
    lab = emb.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).cast("long").alias("label")
    )
    pairs = (
        nn.join(lab.withColumnRenamed("vec_id", "va").withColumnRenamed("label", "la"), "va")
        .join(lab.withColumnRenamed("vec_id", "vb").withColumnRenamed("label", "lb"), "vb")
    )
    return (
        pairs.groupBy(F.col("la").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("la") != F.col("lb"), 1).otherwise(0))
            .cast("long")
            .alias("errors"),
        )
        .select(
            "label",
            "n",
            "errors",
            F.expr("errors * 1000000 div n").cast("long").alias("err_ppm"),
        )
        .orderBy(F.asc("label"))
    )
