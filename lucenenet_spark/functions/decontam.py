"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/probe set.

The published recipe (GPT-3 appendix C / PaLM / Llama data cards):
mark a training document contaminated when it shares at least one
n-token shingle (n≈8-13) with any benchmark example, and either drop
the document or excise the overlapping span. This module implements the
detection + drop stages Spark-first:

- :func:`ngram_overlap_report` — per (doc, probe) pair: number of shared
  distinct n-grams, the doc's distinct n-gram count. Plan shape for
  100 TB: both sides shingle narrowly (the dedup module's sliding
  ``transform`` — no position self-join), the train side joins the
  probe side on an 8-byte xxhash64 of the shingle (narrow shuffle keys;
  the probe side is benchmark-sized, so Spark's AQE broadcasts it —
  the train corpus is never shuffled on the raw strings).
- :func:`decontaminate` — drop every contaminated doc (left_anti join).

Collision note: matching on xxhash64 can only ADD a false pair at
~2^-64 per shingle pair; pass ``exact=True`` to join on the raw shingle
string instead (the mode the DuckDB gate oracle mirrors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.dedup import shingles

__all__ = ["ngram_overlap_report", "decontaminate"]

DEFAULT_N = 13  # GPT-3 appendix C uses 13-token overlap


def _probe_shingles(
    probes: DataFrame, n: int, text_col: str, probe_id_col: str
) -> DataFrame:
    return (
        shingles(probes.select(F.col(probe_id_col).alias("doc_id"), F.col(text_col)),
                 n=n, text_col=text_col)
        .withColumnRenamed("doc_id", "probe_id")
    )


def ngram_overlap_report(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = DEFAULT_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
    exact: bool = False,
) -> DataFrame:
    """(doc_id, probe_id, overlap, doc_grams) for every contaminated pair.

    overlap = |distinct n-grams shared|; doc_grams = |doc's distinct
    n-grams| (for span-fraction policies). Only pairs with overlap >= 1
    appear.
    """
    doc_sh = shingles(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
                      n=n, text_col=text_col)
    probe_sh = _probe_shingles(probes, n, text_col, probe_id_col)
    if not exact:
        doc_sh = doc_sh.withColumn("shash", F.xxhash64("shingle")).drop("shingle")
        probe_sh = probe_sh.withColumn("shash", F.xxhash64("shingle")).drop("shingle")
        join_key = "shash"
    else:
        join_key = "shingle"
    per_doc = doc_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_grams"))
    hits = (
        doc_sh.join(probe_sh, join_key)
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return hits.join(per_doc, "doc_id").select(
        "doc_id", "probe_id",
        F.col("overlap").cast("long").alias("overlap"),
        F.col("doc_grams").cast("long").alias("doc_grams"),
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    *,
    n: int = DEFAULT_N,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """Drop every training doc sharing >= min_overlap n-grams with any
    probe. One shingle pass per side, one anti-join on doc_id."""
    bad = (
        ngram_overlap_report(
            docs, probes, n=n, text_col=text_col,
            id_col=id_col, probe_id_col=probe_id_col,
        )
        .filter(F.col("overlap") >= min_overlap)
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return docs.join(bad, id_col, "left_anti")
