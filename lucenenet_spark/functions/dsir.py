"""DSIR data selection: importance resampling over hashed n-grams.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
published paper + public reference implementation) selects pretraining
documents from a raw web corpus to match a target domain: fit
bag-of-hashed-ngrams unigram models p (target) and q (raw), weight every
raw document by ``log p(x) - log q(x)`` summed over its hashed
unigram+bigram features, then draw k documents without replacement via
the Gumbel top-k trick over the log weights.

Scale design (100 TB): the feature space is a fixed ``n_buckets``-slot
hash table, so both models are at most ``n_buckets`` rows — they ride
broadcast joins, never a shuffle. Gram construction is per-row array
expressions (zero shuffle); per-document feature counts are one
``groupBy(id, bucket)``; the weight is one broadcast join plus one
``groupBy(id)``. The Gumbel perturbation is a deterministic per-row hash
(reproducible selections, no RNG state), and the selection itself is a
TakeOrdered top-k, not a global sort.

Hash conventions shared with functions/dedup.py: the bucket hash is the
first 8 hex chars of md5 as a 32-bit integer (identical hex output in
Spark and DuckDB, so every gate oracle can reproduce it exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default hashed feature-table width (the public DSIR release uses 10^4;
#: a power of two keeps the modulo cheap and the oracle identical)
N_BUCKETS = 8192

#: 2^32 + 1 — maps the 32-bit hex8 hash into the OPEN interval (0, 1)
#: so ln(u) and ln(-ln(u)) are always finite
_HEX8_OPEN_DIV = 4294967297.0


def _hex8(col: Column) -> Column:
    """First 8 hex chars of md5(col) as a big-endian 32-bit integer
    (same base hash as functions/dedup.py minhash_base)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def hashed_gram_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed n-gram feature counts.

    Grams are whitespace unigrams plus (by default) adjacent-token
    bigrams, built with per-row array expressions — the corpus pass adds
    zero shuffles before the one ``groupBy(id, bucket)``.
    """
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    grams = F.col("_toks")
    if bigrams:
        # F.transform's lambda receives (element, 0-based index); the
        # bigram partner is element_at(_toks, i + 2) because element_at
        # is 1-based
        big = F.expr(
            "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
            "(t, i) -> concat(t, ' ', element_at(_toks, i + 2)))"
        )
        grams = F.concat(grams, big)
    g = base.select("_id", F.explode(grams).alias("gram"))
    return (
        g.select("_id", F.pmod(_hex8(F.col("gram")), F.lit(n_buckets)).alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .withColumnRenamed("_id", id_col)
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """(id, logw): per-raw-document log importance weight
    ``sum_f cnt_f * (ln p_f - ln q_f)`` under Laplace-smoothed hashed
    bucket models (p fit on ``target``, q fit on ``raw``).

    Buckets absent from the target model fall back to the smoothed-zero
    probability ``1 / (p_total + n_buckets)`` via the left join's
    coalesce; every raw bucket is present in q by construction.
    """
    raw_counts = hashed_gram_counts(
        raw, text_col=text_col, id_col=id_col, n_buckets=n_buckets, bigrams=bigrams
    )
    tgt_counts = hashed_gram_counts(
        target, text_col=text_col, id_col=id_col, n_buckets=n_buckets, bigrams=bigrams
    )
    p = tgt_counts.groupBy("bucket").agg(F.sum("cnt").alias("pc"))
    q = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("qc"))
    ptot = p.agg(F.sum("pc").cast("double").alias("ptot"))
    qtot = q.agg(F.sum("qc").cast("double").alias("qtot"))
    contrib = (
        raw_counts.join(F.broadcast(q), "bucket")
        .join(F.broadcast(p), "bucket", "left")
        .crossJoin(F.broadcast(ptot))
        .crossJoin(F.broadcast(qtot))
        .select(
            id_col,
            (
                F.col("cnt")
                * (
                    F.ln(
                        (F.coalesce(F.col("pc"), F.lit(0)) + F.lit(1))
                        / (F.col("ptot") + F.lit(float(n_buckets)))
                    )
                    - F.ln(
                        (F.col("qc") + F.lit(1))
                        / (F.col("qtot") + F.lit(float(n_buckets)))
                    )
                )
            ).alias("_w"),
        )
    )
    return contrib.groupBy(id_col).agg(F.sum("_w").alias("logw"))


def _gumbel_key(id_col: str, seed: str) -> Column:
    """Deterministic standard-Gumbel draw per document: u from the hex8
    hash of ``seed#id`` mapped into (0,1), g = -ln(-ln(u))."""
    u = (
        _hex8(F.concat(F.lit(seed + "#"), F.col(id_col).cast("string")))
        + F.lit(1).cast("double")
    ) / F.lit(_HEX8_OPEN_DIV)
    return -F.ln(-F.ln(u))


def dsir_gumbel_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """(id, logw_q, gumbel_q): the k documents DSIR selects — Gumbel
    top-k over the log importance weights (equivalent to sampling k
    without replacement proportionally to the importance weights), with
    both the weight and the perturbed key quantized to 1e-4 bigints.
    Ties break on id for a total order."""
    w = dsir_log_weights(
        raw,
        target,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        bigrams=bigrams,
    )
    key = F.col("logw") + _gumbel_key(id_col, seed)
    qz = lambda c: F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return (
        w.select(id_col, qz(F.col("logw")).alias("logw_q"), qz(key).alias("gumbel_q"))
        .orderBy(F.desc("gumbel_q"), F.asc(id_col))
        .limit(k)
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    seed: str = "dsir",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """The selected raw documents themselves (all original columns):
    ``dsir_gumbel_topk`` ids semi-joined back against the corpus."""
    picked = dsir_gumbel_topk(
        raw,
        target,
        k,
        seed=seed,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        bigrams=bigrams,
    ).select(id_col)
    return raw.join(picked, id_col, "left_semi")
