"""BM25F: multi-field BM25 with per-field weighted, length-normalized
term frequencies combined BEFORE saturation.

Robertson, Zaragoza & Taylor CIKM'04 ("Simple BM25 extension to
multiple weighted fields"): summing per-field BM25 scores (what
Lucene's MultiFieldQueryParser does — QueryParser/MultiFieldQueryParser.cs)
double-counts the saturation, so a term matching many fields weakly can
outrank one strong field. BM25F instead computes

    tfn(t,d) = Σ_f  w_f · tf_f / (1 − b_f + b_f · dl_f / avgdl_f)
    score    = idf(t) · tfn / (k1 + tfn)

with ONE saturation over the combined, field-weighted frequency and a
DOCUMENT-level idf (df counts docs where the term appears in ANY field).
This is beyond what the reference can express natively — its per-field
postings formats force the per-field-sum approximation.

Spark shape: the engine's multi-field postings already carry (field,
term, doc_id, tf, dl); one filter per query term, a union across
fields, one groupBy(doc_id) sum, and a broadcast one-row df scalar —
no UDF, no collect, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def bm25f_topk(
    index: InvertedIndex,
    term: str,
    weights: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25F for one term over the fields in ``weights``.

    Determinism contract (gate oracle): per-field avgdl is the exact
    double sumTotalTermFreq(f)/maxDoc; tfn accumulates in field-name
    order via a union + sum on quantized-identical expressions; idf
    uses the cross-field document frequency. score_q = floor(score *
    10000 + 0.5).
    """
    n = float(index.max_doc)
    rows = index.postings.filter(F.col("term") == term).filter(
        F.col("field").isin(*weights)
    )
    # document-level df: docs containing the term in ANY weighted field
    df_frame = rows.agg(F.countDistinct("doc_id").cast("double").alias("df"))

    parts = []
    for fld in sorted(weights):
        w = float(weights[fld])
        avgdl = float(index._sttf(fld)) / n
        p = rows.filter(F.col("field") == fld).select(
            "doc_id",
            (
                F.lit(w)
                * F.col("tf")
                / (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ).alias("tfn_part"),
        )
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    tfn = u.groupBy("doc_id").agg(F.sum("tfn_part").alias("tfn"))
    scored = tfn.crossJoin(F.broadcast(df_frame)).select(
        "doc_id",
        F.floor(
            F.log(
                F.lit(1.0)
                + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            )
            * F.col("tfn")
            / (F.lit(k1) + F.col("tfn"))
            * F.lit(10000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("score_q"),
    )
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(k)
