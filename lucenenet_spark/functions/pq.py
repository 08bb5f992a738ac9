"""Product-quantization ANN (IVFADC shape, Jégou/Douze/Schmid TPAMI 2011).

The missing third ANN scale path beside IVF-Flat (similarity.ivf_topk) and
hyperplane LSH (similarity.ann_lsh_topk): compress each vector to M bytes
(one code per subspace) and answer queries by scanning CODES, not floats —
an asymmetric-distance (ADC) table lookup per subspace. At 10^9 vectors a
dim-64 float corpus is 256 GB; the M=8 code table is 8 GB, and the query
scan is M integer array lookups per row inside whole-stage codegen. The
canonical deployment is two-stage: ADC shortlist (k * shortlist_mult by
approximate distance) -> exact re-rank of the shortlist only, so the full
float vectors are touched for O(k) rows.

Determinism contract (shared with similarity.trained_ivf_centroids): the
codebooks are trained driver-side on the pinned reference sample with a
seeded Lloyd loop, so their python-float literals embed identically into
Spark Column expressions and the DuckDB oracle SQL. The ADC distance table
is quantized to BIGINT in PYTHON before embedding, making the shortlist
ordering integer-exact across engines.

Vectors are unit-normalized before encoding (the FAISS METRIC_INNER_PRODUCT
practice): on the unit sphere L2² = 2 - 2·cos, so the L2-trained codebooks
and L2 ADC ordering agree with the cosine ground truth the re-rank and the
brute-force baseline use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.similarity import (
    CANONICAL_TRAIN_PATH,
    cosine_topk_arrays_q,
)

_TRAINED_PQ_CACHE: dict[tuple, list[list[list[float]]]] = {}


def train_pq_codebooks(
    vectors,
    m: int = 8,
    ks: int = 16,
    seed: int = 11,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Per-subspace L2 k-means over unit-normalized sample vectors:
    codebooks[m][c] is the c-th centroid (dim/m floats) of subspace m.
    Seeded init from the sample, fixed Lloyd iterations, ties in the
    assignment argmin to the smallest code, empty cells keep their
    previous centroid — the same determinism contract as
    similarity.train_ivf_centroids."""
    import numpy as np

    x = np.asarray(vectors, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for mi in range(m):
        sub = x[:, mi * dsub : (mi + 1) * dsub]
        rng = np.random.default_rng(seed + mi)
        init = np.sort(rng.choice(len(sub), size=ks, replace=False))
        cents = sub[init].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # numpy argmin = first min = smallest code
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def trained_pq_codebooks(
    m: int = 8,
    ks: int = 16,
    seed: int = 11,
    iters: int = 10,
    sample_path: str | None = None,
    max_rows: int = 512,
) -> list[list[list[float]]]:
    """Codebooks trained on the pinned reference sample (vec_id-ordered
    first `max_rows` rows), cached per parameter tuple — the offline
    training step of the IVFADC pipeline, broadcast as literals."""
    import os

    path = sample_path or CANONICAL_TRAIN_PATH
    key = (path, m, ks, seed, iters, max_rows)
    if key not in _TRAINED_PQ_CACHE:
        if not os.path.exists(path):
            raise FileNotFoundError(f"pinned PQ training sample missing: {path}")
        import numpy as np
        import pyarrow.parquet as pq_

        t = pq_.read_table(path, columns=["vec_id", "embedding"])
        order = np.argsort(t.column("vec_id").to_numpy())[:max_rows]
        embs = t.column("embedding").to_pylist()
        sample = np.array([embs[i] for i in order], dtype=np.float64)
        _TRAINED_PQ_CACHE[key] = train_pq_codebooks(
            sample, m=m, ks=ks, seed=seed, iters=iters
        )
    return _TRAINED_PQ_CACHE[key]


def _unit_col(vec_col: str):
    """Unit-normalized copy of an array<float> column as array<double>
    (zero vectors pass through as zeros, never null)."""
    xd = F.transform(F.col(vec_col), lambda a: a.cast("double"))
    n2 = F.aggregate(xd, F.lit(0.0), lambda acc, x: acc + x * x)
    n = F.sqrt(n2)
    return F.transform(xd, lambda a: F.when(n > 0, a / n).otherwise(F.lit(0.0)))


def _sub_score(unit_col, mi: int, cent: list[float], dsub: int):
    """||x_m - c||^2 minus the code-independent ||x_m||^2 term:
    c·c - 2·(x_m·c). Dropping x·x changes no argmin and keeps the
    expression a single sequential fold (the same arithmetic the oracle
    writes as  cc - 2*list_dot_product(sub, c))."""
    sub = F.slice(unit_col, mi * dsub + 1, dsub)
    clit = F.array(*[F.lit(float(v)) for v in cent])
    dot = F.aggregate(
        F.zip_with(sub, clit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cc = float(sum(v * v for v in cent))
    return F.lit(cc) - F.lit(2.0) * dot


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, code0..code{M-1}): per-subspace nearest-centroid code over
    the unit-normalized vector, ties to the smallest code. Pure Column
    expressions — one narrow scan, no shuffle, codegen throughout; this is
    the map stage that would materialize the 10^9-row code table."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    unit = _unit_col(vec_col)
    cols = [F.col(id_col).alias("vec_id")]
    for mi in range(m):
        scores = [_sub_score(unit, mi, c, dsub) for c in codebooks[mi]]
        best = F.least(*scores)
        code = F.coalesce(
            *[F.when(scores[c] == best, F.lit(c)) for c in range(len(scores))]
        )
        cols.append(code.alias(f"code{mi}"))
    return emb.select(*cols)


def pq_distance_table_q(
    query: list[float], codebooks: list[list[list[float]]]
) -> list[list[int]]:
    """ADC lookup table for a query, quantized to BIGINT in python:
    table[m][c] = floor(||q_m - c||^2 * 1e4 + 0.5) over the unit-normalized
    query. Integer literals on both engines -> the shortlist ordering is
    bit-exact across Spark and the SQL oracle."""
    import math

    n = math.sqrt(sum(float(x) * float(x) for x in query))
    q = [float(x) / n if n > 0 else 0.0 for x in query]
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    table: list[list[int]] = []
    for mi in range(m):
        qsub = q[mi * dsub : (mi + 1) * dsub]
        # Expansion form qq + cc - 2*dot with sequential left-to-right
        # folds: the exact arithmetic the SQL oracle writes with
        # list_dot_product, so the quantized entries agree bit-for-bit.
        qq = sum(a * a for a in qsub)
        row = []
        for cent in codebooks[mi]:
            cc = sum(float(v) * float(v) for v in cent)
            dot = sum(a * float(b) for a, b in zip(qsub, cent))
            d2 = qq + cc - 2.0 * dot
            row.append(int(math.floor(d2 * 10000.0 + 0.5)))
        table.append(row)
    return table


def pq_adc_shortlist(
    emb: DataFrame,
    query: list[float],
    codebooks: list[list[list[float]]],
    n_short: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, adc_q): the n_short approximate nearest neighbors by
    quantized ADC distance (ascending, ties to smallest vec_id). The scan
    reads codes + the integer lookup arrays only — TakeOrdered(n_short),
    no shuffle."""
    table = pq_distance_table_q(query, codebooks)
    codes = pq_encode(emb, codebooks, id_col=id_col, vec_col=vec_col)
    return _adc_over_codes(codes, table, n_short)


def _adc_over_codes(codes: DataFrame, table: list[list[int]], n_short: int) -> DataFrame:
    """ADC TakeOrdered over a pre-encoded codes frame (vec_id, code0..) —
    the shared shortlist tail of pq_adc_shortlist and ivfpq_topk."""
    adc = None
    for mi, row in enumerate(table):
        lut = F.array(*[F.lit(int(v)) for v in row])
        term = F.element_at(lut, F.col(f"code{mi}") + 1).cast("long")
        adc = term if adc is None else adc + term
    return (
        codes.select("vec_id", adc.alias("adc_q"))
        .orderBy(F.asc("adc_q"), F.asc("vec_id"))
        .limit(n_short)
    )


def ivfpq_encode(
    emb: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cid, code0..code{M-1}): IVF cell assignment (argmax raw dot,
    ties to smallest cid — ivf_assign's convention) PLUS the PQ codes over
    the unit-normalized vector, in ONE narrow scan. This is the index-build
    step of IVFADC: materialize it once (e.g. save as parquet partitioned
    by cid) and every query thereafter reads only its probed cells' codes —
    at 10^9 vectors the per-query scan is nprobe/n_cells of an 8-byte-per-
    vector table, never the floats."""
    from lucenenet_spark.functions.similarity import _dot_lit

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dots = [_dot_lit(vec_col, c) for c in centroids]
    best = F.greatest(*dots)
    cid = F.coalesce(
        *[F.when(dots[c] == best, F.lit(c)) for c in range(len(centroids))]
    )
    unit = _unit_col(vec_col)
    cols = [F.col(id_col).alias("vec_id"), cid.alias("cid")]
    for mi in range(m):
        scores = [_sub_score(unit, mi, c, dsub) for c in codebooks[mi]]
        low = F.least(*scores)
        code = F.coalesce(
            *[F.when(scores[c] == low, F.lit(c)) for c in range(len(scores))]
        )
        cols.append(code.alias(f"code{mi}"))
    return emb.select(*cols)


def ivfpq_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    ivf_seed: int = 7,
    m: int = 8,
    ks: int = 16,
    pq_seed: int = 11,
    shortlist_mult: int = 4,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """True IVFADC (FAISS IVFPQ with by_residual=false): trained coarse
    cells route the scan, PQ codes answer it. The query probes its
    top-nprobe cells (driver arithmetic over centroid literals — a literal
    IN predicate, partition-prunable when the codes table is stored
    partitioned by cid), builds the integer ADC table, shortlists by codes
    alone within the probed cells, and re-ranks the bounded shortlist by
    exact quantized cosine via IN-list pushdown."""
    from lucenenet_spark.functions.similarity import trained_ivf_centroids

    cents = (
        centroids
        if centroids is not None
        else trained_ivf_centroids(n_cells, ivf_seed)
    )
    books = (
        codebooks if codebooks is not None else trained_pq_codebooks(m, ks, pq_seed)
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()[0][0]
    ]
    # probe selection: raw-dot ranking, ties to smallest cid — the same
    # convention as similarity.ivf_topk and its oracle
    ranked = sorted(
        range(len(cents)),
        key=lambda c: (-sum(a * b for a, b in zip(cents[c], qvec)), c),
    )
    probe = ranked[:nprobe]
    table = pq_distance_table_q(qvec, books)
    enc = ivfpq_encode(emb, cents, books).filter(F.col("cid").isin(probe))
    short = _adc_over_codes(enc, table, n_short=k * shortlist_mult)
    ids = [r["vec_id"] for r in short.select("vec_id").collect()]
    sub = emb.filter(F.col("vec_id").isin(ids))
    return cosine_topk_arrays_q(sub, qvec, k)


def pq_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    seed: int = 11,
    shortlist_mult: int = 4,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ-ADC ANN, two-stage: integer ADC shortlist of k*shortlist_mult
    codes-only candidates, then exact quantized-cosine re-rank of the
    shortlist — (vec_id, cos_q) like the other ANN entry points. Only the
    shortlist rows ever touch the full float vectors."""
    books = codebooks if codebooks is not None else trained_pq_codebooks(m, ks, seed)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()[0][0]
    ]
    short = pq_adc_shortlist(emb, qvec, books, n_short=k * shortlist_mult)
    # The shortlist is BOUNDED (k * shortlist_mult rows) — collect the ids
    # and push them down as an IN-list predicate instead of joining, the
    # block_searcher pattern: the re-rank becomes a pruned scan with no
    # broadcast of the (expensive-to-build) codes subplan.
    ids = [r["vec_id"] for r in short.select("vec_id").collect()]
    sub = emb.filter(F.col("vec_id").isin(ids))
    return cosine_topk_arrays_q(sub, qvec, k)
