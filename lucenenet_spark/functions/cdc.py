"""Content-defined chunking (CDC) — the rolling-hash chunk-boundary
primitive behind storage-level deduplication (Muthitacharoen, Chen &
Mazières, "A Low-Bandwidth Network File System", SOSP'01; Rabin
fingerprints).

Fixed-size chunking breaks under insertion: one added byte shifts every
later boundary, so no downstream chunk deduplicates.  CDC instead cuts
where a rolling hash of the trailing ``window`` characters satisfies
``hash % divisor == 0`` — boundaries are decided by CONTENT, so an
insertion only disturbs the chunks it touches and everything after the
next content-defined cut realigns (the shift-invariance the twins
assert).  Minimum / maximum chunk lengths are enforced sequentially: a
candidate cut closer than ``min_len`` to the previous cut is skipped,
and a cut is FORCED at ``max_len``.

Determinism across engines: the window hash is the first 8 hex chars of
md5(window) as a 32-bit integer (the dedup-family base-hash pattern),
so Spark and DuckDB see identical boundary candidates; the sequential
min/max fold is one F.aggregate over the document's positions — no UDF,
no shuffle (each document folds independently).

Scale: per-document work is O(len) hash evaluations and one linear
fold, embarrassingly parallel over documents; at production scale the
md5-per-position becomes a true O(1)-update Rabin polynomial (documented
substitution — the boundary SET is the contract, not the hash family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks"]


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 32,
    min_len: int = 16,
    max_len: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk every document by content-defined boundaries.

    Output: (doc_id, chunk_idx, start, chunk_len, sig) — sig is the
    first-8-hex md5 of the chunk text as a 32-bit integer, the key a
    chunk-store deduplicates on.  start is 1-based; chunks cover the
    text exactly (sum of chunk_len == length(text)).
    """
    if min_len < window:
        raise ValueError(f"min_len ({min_len}) must be >= window ({window})")
    txt = F.col(text_col)
    n = F.length(txt)
    # boundary candidate at position i (1-based, i >= window): md5 of the
    # trailing window, low 32 bits, % divisor == 0
    is_cut = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.when(
            i >= window,
            F.conv(
                F.substring(F.md5(F.substr(txt, i - F.lit(window - 1), F.lit(window))), 1, 8),
                16,
                10,
            ).cast("long")
            % divisor
            == 0,
        ).otherwise(F.lit(False)),
    )
    # sequential fold: state = (last_cut, cuts array); cut at i when the
    # candidate fires past min_len, or forced at max_len
    cuts = F.aggregate(
        F.zip_with(
            is_cut, F.sequence(F.lit(1), n), lambda c, i: F.struct(c.alias("c"), i.alias("i"))
        ),
        F.struct(
            F.lit(0).alias("last"), F.array().cast("array<int>").alias("cuts")
        ),
        lambda st, x: F.when(
            ((x["i"] - st["last"] >= min_len) & x["c"])
            | (x["i"] - st["last"] >= max_len),
            F.struct(
                x["i"].alias("last"),
                F.concat(st["cuts"], F.array(x["i"])).alias("cuts"),
            ),
        ).otherwise(st),
        # close the final partial chunk at end-of-doc
        lambda st: F.when(
            (st["last"] < n) & (n > 0),
            F.concat(st["cuts"], F.array(n.cast("int"))),
        ).otherwise(st["cuts"]),
    )
    d = docs.select(F.col(id_col).alias("doc_id"), txt.alias("_t"), cuts.alias("_cuts"))
    d = d.select(
        "doc_id",
        "_t",
        F.posexplode(
            F.zip_with(
                F.concat(F.array(F.lit(0)), F.slice("_cuts", 1, F.greatest(F.size("_cuts") - 1, F.lit(0)))),
                F.col("_cuts"),
                lambda a, b: F.struct((a + 1).alias("start"), (b - a).alias("clen")),
            )
        ).alias("chunk_idx", "ch"),
    )
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("ch.start").cast("long").alias("start"),
        F.col("ch.clen").cast("long").alias("chunk_len"),
        F.conv(
            F.substring(F.md5(F.substr(F.col("_t"), F.col("ch.start"), F.col("ch.clen"))), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("sig"),
    )
