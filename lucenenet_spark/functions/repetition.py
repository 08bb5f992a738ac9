"""Repetition-based quality signals (Gopher-style) for corpus filtering.

The Gopher/MassiveText quality rules (Rae et al. 2021, published) flag
documents dominated by repeated words or n-grams. Implemented here as the
LLM-pipeline analogue: per document,

- ``n_tokens``        total whitespace tokens
- ``n_unique``        distinct tokens
- ``top_word_q``      most-frequent single token's share of tokens, 1e-4
- ``top_bigram_q``    most-frequent word 2-gram's share of bigrams, 1e-4

Scale design: everything is PER-ROW array arithmetic — ``split`` +
``array_sort`` + ``aggregate`` (longest equal-run scan over the sorted
array = the mode count). ZERO shuffles, no explode, no groupBy; the plan
is a single projection over the scan and survives any corpus size. The
2-arg ``transform`` lambda receives (element, index) — used here
deliberately to pair each token with its successor for bigrams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mode_count(arr: Column) -> Column:
    """Count of the most frequent element: longest run in the sorted array."""
    srt = F.array_sort(arr)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(srt, acc0, merge, lambda a: a["best"])


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    n = F.size(toks)
    # bigram[i] = toks[i] + ' ' + toks[i+1]; transform's 2nd lambda arg IS
    # the element index (1-based element_at lookup for the successor)
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
    )
    q = lambda num, den: F.floor(
        F.lit(10000.0) * num / F.greatest(den, F.lit(1)) + F.lit(0.5)
    ).cast("long")
    return df.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        q(_mode_count(toks), n).alias("top_word_q"),
        q(_mode_count(bigrams), F.size(bigrams)).alias("top_bigram_q"),
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_word_frac: float = 0.20,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """Keep documents whose repetition signals stay under the thresholds
    (Gopher's rule shape; thresholds are corpus-tuned parameters)."""
    stats = repetition_stats(df, text_col=text_col, id_col=id_col)
    keep = stats.filter(
        (F.col("top_word_q") <= int(max_top_word_frac * 10000))
        & (F.col("top_bigram_q") <= int(max_top_bigram_frac * 10000))
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def lz_window_coverage(
    docs: DataFrame,
    gram: int = 8,
    window: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """LZ77-style local-repetition coverage — the dictionary-free proxy
    for the compression-ratio quality filter (Ziv & Lempel 1977; web
    pipelines drop documents whose bytes compress too well, e.g. the
    RefinedWeb/Gopher repetition screens).

    A character position i carries a REPEATED gram iff the ``gram``-char
    substring starting at i also starts at some earlier j with
    i - window <= j < i — exactly the "match within the sliding window"
    test a greedy LZ77 parser performs, minus the length extension.
    rep_ppm = repeated positions * 1e6 DIV total positions; a document
    dominated by boilerplate or looped text scores high.

    One narrow self-join on (doc_id, gram text) restricted by the
    window predicate — per-doc work is O(positions x window collisions),
    embarrassingly parallel over documents; no UDF.
    """
    # sequence(1, 0) in Spark DESCENDS ([1, 0]); guard sub-gram docs to an
    # empty array so they emit no positions (matching the SQL oracle).
    pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.expr(
                f"CASE WHEN length({text_col}) >= {gram} THEN"
                f" transform(sequence(1, length({text_col}) - {gram - 1}),"
                f" i -> substring({text_col}, i, {gram}))"
                f" ELSE CAST(array() AS array<string>) END"
            )
        ).alias("i", "g"),
    )
    a = pos.select("doc_id", F.col("i").alias("ia"), F.col("g"))
    b = pos.select("doc_id", F.col("i").alias("jb"), F.col("g"))
    rep = (
        a.join(b, ["doc_id", "g"])
        .filter((F.col("jb") < F.col("ia")) & (F.col("ia") - F.col("jb") <= window))
        .select("doc_id", F.col("ia"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_repeated"))
    )
    tot = pos.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    return (
        tot.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
        )
        .withColumn("rep_ppm", F.expr("n_repeated * 1000000 DIV n_grams").cast("long"))
    )
