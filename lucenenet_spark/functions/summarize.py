"""Extractive summarization: LexRank sentence centrality.

``lexrank_top_sentences`` — degree-centrality LexRank (Erkan & Radev,
"LexRank: Graph-based Lexical Centrality as Salience in Text
Summarization", JAIR 2004 §3: the degree variant; the power-iteration
variant differs only in damping): segment each document into fixed
``sent_len``-token sentences, build the intra-document cosine graph over
raw tf vectors, keep edges whose quantized cosine clears the threshold,
and surface the highest-degree sentence per document — the
query-INDEPENDENT summary unit (the query-dependent counterpart is
``search.passages.max_passage_topk``).

Determinism: dot products and squared norms are exact integer sums; one
double formula (dot / (sqrt(n2a) * sqrt(n2b))) is quantized to q6 and
the threshold compares QUANTIZED integers, so engines agree bit-for-bit.
Degree is an integer count; winners tie-break (degree DESC, sent ASC).

Scale shape: the pairwise join is sparse — sentences meet only through
shared terms (join on (doc_id, term)), and it is confined WITHIN each
document, so the reducer key (doc_id) bounds every similarity block by
the document's own sentence count; no cross-document pair is ever
materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lexrank_top_sentences"]


def lexrank_top_sentences(
    docs: DataFrame,
    sent_len: int = 15,
    threshold_q6: int = 100000,  # cosine >= 0.1
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sent_id, degree, n_sents): the most central sentence of
    each document under the thresholded cosine graph."""
    if sent_len < 1:
        raise ValueError(f"sent_len must be >= 1, got {sent_len}")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.array_remove(F.split(F.col(text_col), " "), "")).alias(
            "pos", "term"
        ),
    ).select(
        id_col,
        F.floor(F.col("pos") / F.lit(sent_len)).cast("long").alias("sent_id"),
        "term",
    )
    stf = toks.groupBy(id_col, "sent_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).persist()
    norms = stf.groupBy(id_col, "sent_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2")
    ).persist()
    a = stf.select(
        F.col(id_col), F.col("sent_id").alias("sa"), "term", F.col("tf").alias("tfa")
    )
    b = stf.select(
        F.col(id_col), F.col("sent_id").alias("sb"), "term", F.col("tf").alias("tfb")
    )
    dots = (
        a.join(b, [id_col, "term"])
        .filter(F.col("sa") < F.col("sb"))
        .groupBy(id_col, "sa", "sb")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).cast("long").alias("dot"))
    )
    cos = (
        dots.join(
            norms.select(F.col(id_col), F.col("sent_id").alias("sa"), F.col("n2").alias("n2a")),
            [id_col, "sa"],
        )
        .join(
            norms.select(F.col(id_col), F.col("sent_id").alias("sb"), F.col("n2").alias("n2b")),
            [id_col, "sb"],
        )
        .select(
            id_col,
            "sa",
            "sb",
            F.floor(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double")))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cos_q6"),
        )
        .filter(F.col("cos_q6") >= threshold_q6)
    )
    # each surviving undirected edge feeds both endpoints' degrees
    ends = cos.select(id_col, F.col("sa").alias("sent_id")).unionByName(
        cos.select(id_col, F.col("sb").alias("sent_id"))
    )
    deg = ends.groupBy(id_col, "sent_id").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    n_sents = norms.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sents")
    )
    sent_deg = (
        norms.select(id_col, "sent_id")
        .join(deg, [id_col, "sent_id"], "left")
        .withColumn("degree", F.coalesce(F.col("degree"), F.lit(0)).cast("long"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("degree"), F.asc("sent_id"))
    return (
        sent_deg.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .join(n_sents, id_col)
        .select(id_col, "sent_id", "degree", "n_sents")
    )
