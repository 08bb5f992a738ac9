"""Deduplication operators for web-scale corpora.

Exact dedup, MinHash+LSH banding, and n-gram-shingle Jaccard — each as a
declarative DataFrame plan (single shuffle per stage, map-side partial
aggregation, no driver-side loops), designed so the same plan runs on
10^12 documents:

- exact: shuffle on a 128-bit digest — uniformly distributed keys, no skew;
- minhash: per-doc signatures are a bounded-size aggregate (n_hashes mins);
  the LSH band bucket-join only shuffles (band, bucket) keys, so candidate
  generation is O(sum of bucket sizes), never the O(N^2) cross join;
- jaccard: shingle join blows up only within near-duplicate clusters, which
  is exactly the work the operator must do; a threshold filter on quantized
  similarity keeps output deterministic across engines.

The reference's only dedup surface is DuplicateFilter
(Lucene.Net.Sandbox/Queries/DuplicateFilter.cs) — exact term-keyed dedup;
the near-dup family generalizes it for training-data pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, keep_doc_id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).cast("long").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct n-gram token shingles per doc: (doc_id, shingle).

    Built by position self-joins over the whitespace token stream (the
    webtext corpus is pre-normalized); at scale the join keys are
    (doc_id, pos) — perfectly partitioned, no skew.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    a, b, c = tok.alias("a"), tok.alias("b"), tok.alias("c")
    joined = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1),
    )
    if n == 3:
        joined = joined.join(
            c,
            (F.col("c.doc_id") == F.col("a.doc_id")) & (F.col("c.pos") == F.col("a.pos") + 2),
        )
        sh = F.concat_ws(" ", F.col("a.term"), F.col("b.term"), F.col("c.term"))
    elif n == 2:
        sh = F.concat_ws(" ", F.col("a.term"), F.col("b.term"))
    else:
        raise ValueError("n in (2, 3) supported")
    return joined.select(F.col("a.doc_id").alias("doc_id"), sh.alias("shingle")).distinct()


def minhash_signatures(terms: DataFrame, n_hashes: int = 8) -> DataFrame:
    """Per-doc MinHash signature columns h0..h{n-1}.

    Each "permutation" i is the uniform hash term -> md5(term || '#i');
    the signature entry is the lexicographic min over the doc's distinct
    term set (set semantics, so tf doesn't affect the signature).
    """
    distinct = terms.select("doc_id", "term").distinct()
    aggs = [
        F.min(F.md5(F.concat(F.col("term"), F.lit(f"#{i}")).cast("binary"))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return distinct.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(terms: DataFrame, n_hashes: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b) from banded MinHash signatures."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(terms, n_hashes)
    band_frames = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        bucket = F.md5(F.concat(*cols).cast("binary"))
        band_frames.append(
            sig.select("doc_id", F.lit(b).alias("band"), bucket.alias("bucket"))
        )
    bands_df = reduce(lambda a, c: a.unionByName(c), band_frames)
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold_q: int = 8000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """n-gram-shingle Jaccard near-dup pairs with quantized similarity.

    Returns (doc_a, doc_b, jacc_q) where jacc_q = floor(J*10000+0.5) and
    J >= threshold_q/10000. The threshold is applied on the quantized value
    so the selected set is engine-deterministic.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )
    a, b, c = tok.alias("a"), tok.alias("b"), tok.alias("c")
    joined = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id")) & (F.col("b.pos") == F.col("a.pos") + 1),
    )
    if n == 3:
        joined = joined.join(
            c,
            (F.col("c.doc_id") == F.col("a.doc_id")) & (F.col("c.pos") == F.col("a.pos") + 2),
        )
        shingle = F.concat_ws(" ", F.col("a.term"), F.col("b.term"), F.col("c.term"))
    elif n == 2:
        shingle = F.concat_ws(" ", F.col("a.term"), F.col("b.term"))
    else:
        raise ValueError("n in (2, 3) supported")
    sh = joined.select(F.col("a.doc_id").alias("doc_id"), shingle.alias("shingle")).distinct()

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        sa.join(
            sb,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jacc = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    jacc_q = F.floor(jacc * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jacc_q.alias("jacc_q"))
        .filter(F.col("jacc_q") >= threshold_q)
    )


def simhash64(terms: DataFrame, tf_col: str | None = "tf", n_bits: int = 60) -> DataFrame:
    """SimHash per doc from (doc_id, term[, tf]) rows (n_bits <= 60).

    Bit i of the fingerprint is the sign of sum over terms of
    weight * (bit_i(md5(term)) ? +1 : -1), where bit i indexes the 60-bit
    integer int(md5hex[0:15], 16) LSB-first. All-integer arithmetic —
    engine-portable (conv hex -> bigint, JVM-side) and exactly
    reproducible in SQL.
    """
    w = F.col(tf_col).cast("long") if tf_col else F.lit(1).cast("long")
    h = F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 15), 16, 10).cast("long")
    t = terms.select("doc_id", h.alias("h60"), w.alias("w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h60"), i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{i}")
        for i in range(n_bits)
    ]
    agg = t.groupBy("doc_id").agg(*bit_sums)
    fp = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"s{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long")),
        range(n_bits),
        F.lit(0).cast("long"),
    )
    return agg.select("doc_id", fp.alias("simhash"))
