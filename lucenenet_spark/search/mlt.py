"""MoreLikeThis: build a query from a source doc's top-TFIDF terms.

Reference: src/Lucene.Net.Queries/Mlt/MoreLikeThis.cs:129 — select the
source doc's terms passing (minTermFreq, minDocFreq, maxDocFreq) gates,
rank by tf * idf (idf = log(numDocs/(docFreq+1)) + 1, MoreLikeThis.cs
DefaultSimilarity TF-IDF — NOT BM25), keep maxQueryTerms best, emit an OR
query (optionally boosted by score/bestScore).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.queries import BooleanClause, BooleanQuery, Occur, TermQuery


def more_like_this_query(
    index: InvertedIndex,
    doc_id: int,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_doc_freq: int | None = None,
    boost: bool = False,
    field: str | None = None,
) -> BooleanQuery:
    """Build the MLT OR-query for one stored document.

    Distributed shape: one pushdown scan of the doc's postings row-group +
    a broadcast-size join with term_stats; only maxQueryTerms rows reach
    the driver.
    """
    fld = field or index.default_field
    doc_terms = (
        index.postings.filter((F.col("field") == fld) & (F.col("doc_id") == doc_id))
        .select("term", "tf")
    )
    stats = index.term_stats.filter(F.col("field") == fld).select("term", "df")
    cand = doc_terms.join(stats, "term").filter(F.col("tf") >= min_term_freq)
    cand = cand.filter(F.col("df") >= min_doc_freq)
    if max_doc_freq is not None:
        cand = cand.filter(F.col("df") <= max_doc_freq)
    rows = cand.select("term", "tf", "df").collect()

    n = index.max_doc
    scored = []
    for r in rows:
        idf = math.log(n / (r["df"] + 1)) + 1.0  # DefaultSimilarity.Idf
        s = r["tf"] * idf
        # rank on the QUANTIZED tf*idf (floor(s*1e6+0.5)) with the term as
        # tie-break — deterministic across engines/libm, so an SQL oracle
        # can reproduce the selected term set exactly
        scored.append((math.floor(s * 1e6 + 0.5), s, r["term"]))
    scored.sort(key=lambda x: (-x[0], x[2]))
    top = [(s, t) for _, s, t in scored[:max_query_terms]]
    if not top:
        return BooleanQuery(clauses=())
    best = top[0][0]
    clauses = tuple(
        BooleanClause(
            TermQuery(t, field=fld, boost=(s / best) if boost else 1.0), Occur.SHOULD
        )
        for s, t in top
    )
    return BooleanQuery(clauses=clauses)


def interesting_terms(
    index: InvertedIndex,
    max_doc_id: int = 8,
    per_doc: int = 5,
    min_term_freq: int = 2,
    min_doc_freq: int = 2,
    field: str | None = None,
):
    """MoreLikeThis.RetrieveInterestingTerms as a SET-BASED DataFrame op.

    Reference: src/Lucene.Net.Queries/Mlt/MoreLikeThis.cs:674
    (RetrieveInterestingTerms) ranks one document's terms by tf * idf
    (idf = ln(numDocs/(docFreq+1)) + 1, DefaultSimilarity) after the
    (minTermFreq, minDocFreq) gates and returns the best terms. The
    reference API is one-doc-at-a-time; re-expressed Spark-first it is
    one plan for a whole SEED SET of documents — postings ⋈ term_stats
    plus a per-doc row_number window — so "give me the MLT terms of
    every doc in this partition of the crawl" is a single distributed
    pass instead of a driver loop.

    Determinism: scores quantized to floor(score*1e6 + 0.5) with term
    ASC tie-break, so the selected set is engine-independent.

    Output: (doc_id, rnk, term, score_q) for doc_id < max_doc_id.
    """
    from pyspark.sql import Window

    fld = field or index.default_field
    p = index.postings.filter(
        (F.col("field") == fld) & (F.col("doc_id") < max_doc_id)
    ).select("doc_id", "term", "tf")
    s = index.term_stats.filter(F.col("field") == fld).select("term", "df")
    n = float(index.max_doc)
    scored = (
        p.join(s, "term")
        .filter((F.col("tf") >= min_term_freq) & (F.col("df") >= min_doc_freq))
        .withColumn(
            "score_q",
            F.floor(
                F.col("tf") * (F.log(F.lit(n) / (F.col("df") + 1)) + F.lit(1.0)) * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= per_doc)
        .select("doc_id", "rnk", "term", "score_q")
    )
