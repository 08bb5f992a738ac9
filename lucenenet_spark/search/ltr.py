"""Learning-to-rank feature extraction — the bridge between this
engine and a trained ranker.

Production ranking (Liu, "Learning to Rank for Information Retrieval",
F&T IR 2009; Qin & Liu's LETOR feature sets) is BM25-for-candidates,
model-for-ordering: the engine retrieves a top-N candidate page and
emits a per-(query, doc) feature vector the model consumes.  This
module materializes that vector with the engine's own statistics —
one plan, no UDFs — the export a 100 TB click-log training job runs
per query sample.

Features follow the LETOR convention (query-dependent text features +
query-independent doc features):
  bm25_q4   — the engine's BM25 partial, quantized 1e4
  tf        — raw term frequency
  dl        — field length
  df        — document frequency (collection-global)
  idf_q6    — ln(1 + (N - df + .5)/(df + .5)), quantized 1e6
  tf_norm_q6— tf / dl, quantized (the classic density feature)
  n_chars   — doc static feature (any DocValues column joins the same way)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import TermQuery


def ltr_features(searcher, docs: DataFrame, term: str, k: int = 20) -> DataFrame:
    """Top-k candidate page for one term query with its LETOR-style
    feature vector: (rank, doc_id, bm25_q4, tf, dl, df, idf_q6,
    tf_norm_q6, n_chars)."""
    idx = searcher.index
    fld = idx.default_field
    scored = searcher.scored(TermQuery(term)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("bm25_q4"),
    )
    w = Window.orderBy(F.desc("bm25_q4"), F.asc("doc_id"))
    page = scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
    post = idx.postings.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("doc_id", "tf", "dl")
    stats = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    n = float(idx.max_doc)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    statics = docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))
    return (
        page.join(post, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(statics, "doc_id")
        .select(
            "rank",
            "doc_id",
            "bm25_q4",
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            F.col("df").cast("long").alias("df"),
            F.floor(idf * F.lit(1e6) + F.lit(0.5)).cast("long").alias("idf_q6"),
            F.floor(
                F.col("tf").cast("double") / F.col("dl").cast("double") * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tf_norm_q6"),
            "n_chars",
        )
    )
