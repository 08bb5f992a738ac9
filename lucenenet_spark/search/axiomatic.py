"""Axiomatic retrieval functions F2EXP / F2LOG.

Fang & Zhai, "An exploration of axiomatic approaches to information
retrieval" (SIGIR 2005): scoring functions DERIVED from retrieval
constraints (TFC/TDC/LNC) rather than a probabilistic model; the
successor engine ships them as the Axiomatic similarity family beside
BM25/DFR/IB.  Per query term t in document d:

    F2EXP:  S(t,d) = (N / df)^k        * tf / (tf + s + s * |d| / avgdl)
    F2LOG:  S(t,d) = ln((N + 1) / df)  * tf / (tf + s + s * |d| / avgdl)

with s = 0.5, k = 0.35 (the paper's defaults).  Query score = sum over
terms (C(t,Q) = 1 here).  The gamma length normalization is the pivoted
form shared with the repo's pivoted-VSM ranker; only the idf shape
differs between the two variants.

Plan shape matches the BM25 searcher: per-term stats looked up once
(O(|terms|) dictionary rows), per-term weight a Python scalar folded
into one Column expression over the term's postings, union + groupBy
doc for the additive boolean composition — whole-stage codegen, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.searcher import IndexSearcher

_VARIANTS = ("f2exp", "f2log")


def axiomatic_scored(
    searcher: IndexSearcher,
    terms: list[str],
    variant: str = "f2exp",
    s: float = 0.5,
    k: float = 0.35,
    field: str | None = None,
) -> DataFrame:
    """Additive axiomatic score over ``terms`` -> (doc_id, score).

    Documents matching no term are absent (disjunctive semantics, like
    the BM25 OR scorer).  Terms absent from the collection contribute
    nothing (df = 0 would divide by zero; the constraint framework
    assigns OOV terms zero weight).
    """
    if variant not in _VARIANTS:
        raise ValueError(f"variant must be one of {_VARIANTS}")
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct terms")
    fld = field or searcher.index.default_field
    n = float(searcher.index.max_doc)
    avgdl = searcher.index.avgdl_double_for(fld)
    stats = searcher._term_stats([(fld, t) for t in terms])

    def _weight(t: str) -> float | None:
        df_ = stats.get((fld, t), (0, 0))[0]
        if df_ <= 0:
            return None
        if variant == "f2exp":
            return (n / df_) ** k
        return math.log((n + 1.0) / df_)

    parts = []
    for t in terms:
        w = _weight(t)
        if w is None:
            continue
        p = searcher._postings(fld).filter(F.col("term") == t)
        freq = F.col("tf").cast("double")
        denom = freq + F.lit(float(s)) + F.lit(float(s)) * F.col("dl").cast("double") / F.lit(avgdl)
        parts.append(p.select("doc_id", (F.lit(w) * freq / denom).alias("score")))
    if not parts:
        spark = searcher.index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    if len(parts) == 1:
        return u
    return u.groupBy("doc_id").agg(F.sum("score").alias("score"))
