"""Byte-pair-encoding merge learning (Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016 — the
tokenizer-training algorithm behind BPE/GPT-2 vocabularies).

Classic BPE trains on a word-type frequency table: repeatedly count
adjacent symbol pairs (weighted by word frequency), merge the most
frequent pair everywhere, repeat.  This module runs the first
``n_merges`` rounds fully inside Spark:

* The symbol sequence of each word is a DELIMITED STRING — symbols
  joined by two spaces with a single leading/trailing space
  (`` a  b  c ``).  Applying a merge is then one ``replace(sym,
  ' w1  w2 ', ' w1w2 ')``: the pattern consumes w2's trailing single
  space while the next symbol keeps its own leading space, so
  consecutive merges stay greedy left-to-right EXACTLY like the
  reference re.sub implementation (``a a a a -> aa aa``), and the
  double interior gap means a pattern can never match across a
  multi-character symbol boundary.  Both Spark and DuckDB scan
  ``replace`` left-to-right non-overlapping, so the SQL oracle
  reproduces every round bit-for-bit.
* Each round is: explode adjacent pairs (weighted integer counts),
  groupBy pair, pick the 1-row winner (count DESC, w1 ASC, w2 ASC),
  broadcast it, apply the replace.  No driver collect — the winner
  stays a DataFrame and the per-round plans chain lazily (each round's
  symbol table is persisted so round r+1 scans rounds, not the corpus).

Scale: the state is the word-TYPE table (|vocab| rows, ~10^7 at
web scale), not the corpus; each round is one map + one groupBy over
it.  That is the standard distributed BPE trainer shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_learn_merges"]


def _adjacent_pairs(syms: DataFrame) -> DataFrame:
    """(w1, w2, pair_count) over the current symbol strings, weighted by
    word frequency — exact integers."""
    toks = syms.select(
        F.split(F.trim(F.col("sym")), "  ").alias("t"), "cnt"
    ).filter(F.size("t") >= 2)
    return (
        toks.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> struct(t[i] AS w1, w AS w2))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.w1", "p.w2")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def _train(docs: DataFrame, n_merges: int, text_col: str):
    """(winner frames, final symbol table after ALL merges applied)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        docs.select(
            F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    syms = words.select(
        F.concat(
            F.lit(" "), F.concat_ws("  ", F.split(F.col("w"), "")), F.lit(" ")
        ).alias("sym"),
        "cnt",
    ).persist()
    winners = []
    for rnd in range(1, n_merges + 1):
        winner = (
            _adjacent_pairs(syms)
            .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
            .limit(1)
        )
        winners.append(
            winner.select(
                F.lit(rnd).cast("long").alias("round"), "w1", "w2", "pair_count"
            )
        )
        syms = (
            syms.crossJoin(F.broadcast(winner.select("w1", "w2")))
            .select(
                F.expr(
                    "replace(sym,"
                    " concat(' ', w1, '  ', w2, ' '),"
                    " concat(' ', w1, w2, ' '))"
                ).alias("sym"),
                "cnt",
            )
            .persist()
        )
    return winners, syms


def bpe_learn_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """(round, w1, w2, pair_count): the first n_merges BPE merges learned
    from the corpus' word-frequency table, 1-indexed in merge order."""
    winners, _ = _train(docs, n_merges, text_col)
    return reduce(DataFrame.unionByName, winners)


def bpe_token_stats(
    docs: DataFrame, n_merges: int = 3, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """Apply the learned merges and report the resulting vocabulary's
    head: (rank, token, token_count) for the k most frequent subword
    tokens, weighted by word frequency — the segmentation a trained
    ``n_merges``-rule BPE tokenizer actually produces on this corpus
    (Sennrich ACL'16 §3.2's apply step).  Order (count DESC, token ASC);
    exact integers throughout."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _, syms = _train(docs, n_merges, text_col)
    toks = syms.select(
        F.explode(F.split(F.trim(F.col("sym")), "  ")).alias("token"), "cnt"
    )
    counts = toks.groupBy("token").agg(
        F.sum("cnt").cast("long").alias("token_count")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("token_count"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "token", "token_count")
    )
