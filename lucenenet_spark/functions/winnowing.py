"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003).

The third near-dup family beside MinHash-LSH (set similarity) and SimHash
(cosine-of-profiles): winnowing selects, for every window of ``w``
consecutive k-gram hashes, the window's MINIMUM hash.  The selected set is
a deterministic, position-robust fingerprint with a guarantee MinHash does
not give: any shared substring of length >= w + k - 1 tokens contributes
at least one IDENTICAL fingerprint to both documents, so winnowing finds
*local* (substring) overlap, not just global set resemblance — the MOSS
algorithm, and the dedup signal pipelines use against boilerplate reuse
and quote plagiarism.

Scale shape: fingerprinting is embarrassingly parallel (window function
per doc, no shuffle past the per-doc sort); candidate pairing reuses the
exact bucket-capped join discipline of dedup.minhash_lsh_pairs — hot
fingerprints (boilerplate shared by >max_bucket docs) are dropped BEFORE
the pair join, keeping reducers bounded at 100 TB.

Hash parity: k-grams hash through dedup.minhash_base (first 8 hex chars of
md5 as a 32-bit int) — the one digest Spark and DuckDB compute
identically, so the DuckDB oracle replays fingerprint selection exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.functions.dedup import minhash_base

DEFAULT_K = 4  # tokens per k-gram
DEFAULT_W = 5  # hashes per winnowing window


def winnow_fingerprints(
    docs: DataFrame,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (doc_id, fp) winnowing fingerprints.

    k-gram j (0-based) = tokens[j .. j+k-1] joined by one space; window j
    covers hashes j .. j+w-1 and contributes min(hash).  Documents with
    fewer than w k-grams degenerate to one window over all their hashes
    (so every doc with >= k tokens yields >= 1 fingerprint); documents
    shorter than k tokens yield none.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    # sequence(1, n) descends when n < 1, so short docs need an explicit
    # empty gram list rather than greatest(n, 0)
    gram_list = F.when(
        F.size(toks) >= F.lit(k),
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(gram_list).alias("j", "gram"),
    )
    hashes = grams.select(
        "doc_id", "j", minhash_base(F.col("gram")).alias("h")
    )
    # per-doc hash count decides which window starts are valid
    n_h = Window.partitionBy("doc_id")
    win = Window.partitionBy("doc_id").orderBy("j").rowsBetween(0, w - 1)
    fps = (
        hashes.withColumn("num_h", F.count("*").over(n_h))
        .withColumn("fp", F.min("h").over(win))
        .filter(F.col("j") <= F.greatest(F.col("num_h") - F.lit(w), F.lit(0)))
        .select("doc_id", "fp")
        .distinct()
    )
    return fps


def winnow_pairs(
    fps: DataFrame, min_shared: int = 2, max_bucket_size: int = 64
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing >= min_shared fingerprints.

    Fingerprints shared by more than max_bucket_size docs (site
    boilerplate) are dropped BEFORE the self-join — the same reducer cap
    as minhash_lsh_pairs; without it one viral footer makes an M^2 bucket.
    Returns (doc_a, doc_b, n_shared), doc_a < doc_b.
    """
    sized = fps.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("fp"))
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select(F.col("doc_id").alias("doc_a"), "fp")
    b = sized.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
