"""Exact-substring deduplication: remove duplicated token spans, not docs.

Published recipe (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499 — the ExactSubstr tool): when
the same long token span occurs more than once in the corpus, keep ONE
occurrence and cut the text of every other, leaving the surrounding
document intact. Document-level dedup (exact/MinHash/SemDeDup) misses
this entirely — web pages share quotes, licenses, and templated passages
without being document-level duplicates.

Relationship to :func:`lucenenet_spark.functions.dedup.strip_duplicated_spans`
(gate ``strip_dup_spans``): that transform is the BOILERPLATE-REMOVAL
variant — it strips EVERY occurrence of a cross-document duplicated
gram, keeping none, and ignores within-document repeats. This module is
the paper's DEDUP semantics: "remove all but one" — the corpus-first
occurrence (arg-min on (doc_id, start)) survives so the content itself
is preserved exactly once, and within-document repeats count as
duplicates too. Both are useful; a pipeline typically strips boilerplate
first and dedups content second.

Lee et al. find arbitrary-length >=50-token matches with a corpus-wide
suffix array. The Spark-first equivalent here is the fixed-n sliding-gram
formulation (the shape Dolma/RedPajama-class pipelines actually deploy):
every duplicated span of length >= n is exactly the union of its
duplicated n-grams, so marking the coverage of every duplicated n-gram —
minus one designated "winner" occurrence per gram — removes the same
spans a length-n suffix-array pass would, with no global sort:

- one narrow pass builds positional gram hashes (doc_id, start, md5) —
  the wide text column never enters a shuffle, only 0.03 kB keys;
- duplicated grams are a count >= 2 aggregate (associative — boilerplate
  mega-grams cost one hot counter, not memory);
- the kept occurrence per gram is min(doc_id, start) — an arg-min
  aggregate, deterministic on both engines;
- loser coverage explodes to (doc_id, token_idx) and the rewrite is an
  anti-join + array_sort/concat_ws reassembly in whole-stage codegen.

No Python worker anywhere; every comparison is on integers/md5 strings
so a DuckDB oracle reproduces the rewrite byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["positional_grams", "duplicated_span_losers", "remove_duplicate_spans"]


def positional_grams(
    docs: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, start, ghash): md5 of every n-token window, start 0-based.

    Same sliding-transform shape as dedup.shingles but positional (no
    distinct): ExactSubstr needs every occurrence, including within-doc
    repeats."""
    toks = F.split(F.col(text_col), " ")
    k = F.size(toks) - F.lit(n - 1)
    wins = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                i.alias("start"),
                F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))).alias("ghash"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,ghash:string>>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(wins).alias("w")
    ).select("doc_id", F.col("w.start").alias("start"), F.col("w.ghash").alias("ghash"))


def duplicated_span_losers(grams: DataFrame, min_count: int = 2) -> DataFrame:
    """(doc_id, start) of every occurrence of a duplicated gram EXCEPT the
    corpus-first one (min (doc_id, start)) — the occurrences whose tokens
    get cut. min_count=2 is the ExactSubstr definition ("appears more
    than once in the corpus", within-doc repeats included)."""
    per = grams.groupBy("ghash").agg(
        F.count(F.lit(1)).alias("occ"),
        F.min(F.struct("doc_id", "start")).alias("win"),
    )
    dup = per.filter(F.col("occ") >= min_count).select("ghash", "win")
    return (
        grams.join(dup, "ghash")
        .filter(F.struct("doc_id", "start") != F.col("win"))
        .select("doc_id", "start")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text_clean, removed): every doc rewritten with the tokens
    of its non-winner duplicated n-gram occurrences cut out; `removed` =
    number of tokens dropped. Docs that lose nothing (or are shorter than
    n tokens) pass through with their tokens space-rejoined."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    losers = duplicated_span_losers(
        positional_grams(base, n, "text", "doc_id"), min_count
    )
    covered = losers.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
        ).alias("idx"),
    ).distinct()
    toks = base.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("idx", "tok")
    )
    kept = toks.join(covered, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    n_toks = base.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok"))
    return (
        n_toks.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            (F.col("n_tok") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("removed"),
        )
    )
