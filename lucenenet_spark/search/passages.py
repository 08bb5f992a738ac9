"""Passage-level retrieval and chunk export — the RAG-side surface.

* ``max_passage_topk`` — passage retrieval by max-passage scoring
  (Liu & Croft, "Passage retrieval based on language models", CIKM
  2002; the MaxPsg evidence combination of Callan SIGIR'94): documents
  are ranked by their best fixed-size passage, not their whole-document
  statistics — long documents stop winning on accumulated tf when the
  occurrences are scattered, and the answer-bearing WINDOW surfaces for
  snippet/grounding use.  Passages are fixed 50-position windows over
  the index's positional postings, so no re-tokenization happens at
  query time: passage tf = per-bucket position count, passage length =
  per-bucket surviving-token count, both from one bucketed aggregation.

* ``chunk_export`` — the ingestion-side complement: deterministic
  fixed-size overlapping token chunks (size/stride), the unit a
  retrieval-augmented pipeline embeds and indexes.  Pure Column slices
  over the token array — map-only, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import B, K1

PASSAGE_LEN = 50


def max_passage_topk(
    idx: InvertedIndex,
    term: str,
    k: int = 10,
    passage_len: int = PASSAGE_LEN,
    field: str | None = None,
) -> DataFrame:
    """Top-k documents by their best passage for a single-term query.

    Passage p of a doc covers analyzer positions [p·L, (p+1)·L).
    Passage score is the BM25 kernel with passage-local tf and length
    (idf stays document-level — the standard hybrid):

        idf · (k1+1)·tf_p / (tf_p + k1·((1-b) + b·len_p / L))

    Output (rank, doc_id, passage_id, passage_tf, score_q4): the
    winning passage per doc, globally ranked.
    """
    fld = field or idx.default_field
    post = idx.postings.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("doc_id", "positions")
    # per-(doc, passage) tf from the query term's positions
    ptf = (
        post.select("doc_id", F.explode("positions").alias("pos"))
        .select("doc_id", F.floor(F.col("pos") / F.lit(passage_len)).cast("long").alias("passage_id"))
        .groupBy("doc_id", "passage_id")
        .agg(F.count("*").cast("long").alias("passage_tf"))
    )
    # per-(doc, passage) surviving-token length from ALL terms' positions
    # (one pass over the doc's postings rows — the positional index IS
    # the token stream)
    all_pos = idx.postings.filter(F.col("field") == fld).select(
        "doc_id", F.explode("positions").alias("pos")
    )
    plen = (
        all_pos.select(
            "doc_id", F.floor(F.col("pos") / F.lit(passage_len)).cast("long").alias("passage_id")
        )
        .groupBy("doc_id", "passage_id")
        .agg(F.count("*").cast("long").alias("passage_len"))
    )
    df_ = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    n = float(idx.max_doc)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf = F.col("passage_tf").cast("double")
    nrm = F.lit(K1) * (
        F.lit(1.0 - B)
        + F.lit(B) * F.col("passage_len").cast("double") / F.lit(float(passage_len))
    )
    score = idf * F.lit(K1 + 1.0) * tf / (tf + nrm)
    scored = (
        ptf.join(plen, ["doc_id", "passage_id"])
        .crossJoin(F.broadcast(df_))
        .select(
            "doc_id",
            "passage_id",
            "passage_tf",
            F.floor(score * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q4"),
        )
    )
    best = Window.partitionBy("doc_id").orderBy(
        F.desc("score_q4"), F.asc("passage_id")
    )
    winners = scored.withColumn("prk", F.row_number().over(best)).filter(
        F.col("prk") == 1
    )
    overall = Window.orderBy(F.desc("score_q4"), F.asc("doc_id"))
    return (
        winners.withColumn("rank", F.row_number().over(overall).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "passage_id", "passage_tf", "score_q4")
    )


def chunk_export(
    docs: DataFrame, size: int = 64, stride: int = 48, text_col: str = "text"
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk): fixed-size overlapping raw
    token chunks.  Chunk c covers raw tokens [c·stride, c·stride+size);
    the last chunk may be short, and a chunk starts only while its
    start is inside the doc — every token lands in >= 1 chunk, adjacent
    chunks overlap by size - stride tokens for boundary continuity.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n_chunks = F.ceil(F.size(toks).cast("double") / F.lit(float(stride))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda c: F.struct(
            c.cast("long").alias("chunk_id"),
            F.slice(toks, c * stride + 1, size).alias("words"),
        ),
    )
    return (
        docs.select("doc_id", F.explode(chunks).alias("ch"))
        .select(
            "doc_id",
            F.col("ch.chunk_id").alias("chunk_id"),
            F.size("ch.words").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "ch.words").alias("chunk"),
        )
        .filter(F.col("n_tokens") > 0)
    )
