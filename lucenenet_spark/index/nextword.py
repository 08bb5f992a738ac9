"""Next-word index: the combined-index phrase accelerator of Williams,
Zobel & Bahle, "Fast Phrase Querying with Combined Indexes", ACM TOIS
2004 — materialize (w1, w2) -> (doc, adjacency count) so two-word
phrase queries become a single lookup instead of a positional
intersection.

The pair table is derived from the SAME positional postings the
searcher uses, so position holes left by stop-word removal behave
identically: "a the b" yields positions a=0, b=2 and therefore NO
(a, b) adjacency, exactly as ExactPhraseScorer would find no match.
``nextword_phrase_topk`` scores pf with the searcher's double-mode
BM25 phrase kernel (summed idf of both terms), so its output is
rank- and score-identical to ``PhraseQuery`` — verified by twin test.

Scale: the pair table is one self-join of the positional postings on
(doc, pos+1) and one groupBy — build-time cost, bounded by corpus
positions.  Serving a hot two-word phrase then costs a hash lookup on
the (w1, w2) key instead of intersecting two full posting lists: this
is the tiered structure a web engine keeps for its head phrase
queries (TOIS'04 §4 stores only frequent firstwords; parameterize by
filtering the build to a firstword list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import B, K1

__all__ = ["build_nextword_index", "nextword_phrase_topk"]


def build_nextword_index(
    idx: InvertedIndex, field: str | None = None, firstwords: list[str] | None = None
) -> DataFrame:
    """(w1, w2, doc_id, pair_tf): adjacency counts from the positional
    postings.  ``firstwords`` restricts the build to hot lead words
    (the TOIS'04 partial next-word index)."""
    fld = field or idx.default_field
    p = idx.postings.filter(F.col("field") == fld)
    if firstwords is not None:
        lead = p.filter(F.col("term").isin(list(firstwords)))
    else:
        lead = p
    a = lead.select(
        "doc_id", F.col("term").alias("w1"), F.explode("positions").alias("pos")
    )
    b = p.select(
        "doc_id", F.col("term").alias("w2"), F.explode("positions").alias("pos2")
    ).select("doc_id", "w2", (F.col("pos2") - F.lit(1)).alias("pos"))
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("w1", "w2", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_tf"))
    )


def nextword_phrase_topk(
    idx: InvertedIndex,
    nextword: DataFrame,
    w1: str,
    w2: str,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """(rank, doc_id, pair_tf, score_q): top-k for the exact phrase
    "w1 w2" served FROM the next-word index — BM25 with phrase freq =
    pair_tf and weight = idf(w1) + idf(w2), the ExactPhraseScorer
    composition (reference: Search/ExactPhraseScorer.cs + the summed
    IdfExplain of BM25Similarity), in the searcher's double mode."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    fld = field or idx.default_field
    n = float(idx.max_doc)
    avgdl = idx.avgdl_double_for(fld)

    def _idf(df_col):
        return F.log(
            F.lit(1.0)
            + (F.lit(n) - df_col.cast("double") + F.lit(0.5))
            / (df_col.cast("double") + F.lit(0.5))
        )

    stats = idx.term_stats.filter(F.col("field") == fld)
    s1 = stats.filter(F.col("term") == w1).select(F.col("df").alias("df1"))
    s2 = stats.filter(F.col("term") == w2).select(F.col("df").alias("df2"))
    pf = nextword.filter((F.col("w1") == w1) & (F.col("w2") == w2)).select(
        "doc_id", "pair_tf"
    )
    dl = idx.doclens.filter(F.col("field") == fld).select("doc_id", "dl")
    wv = _idf(F.col("df1")) + _idf(F.col("df2"))
    tf = F.col("pair_tf").cast("double")
    nrm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = wv * F.lit(K1 + 1.0) * tf / (tf + nrm)
    scored = (
        pf.join(dl, "doc_id")
        .crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            "doc_id",
            "pair_tf",
            F.floor(score * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
        )
    )
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "pair_tf", "score_q")
    )
