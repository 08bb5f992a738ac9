"""Similarity seam: pluggable scoring models over the same index layout.

Mirrors the reference's Similarity family (src/Lucene.Net/Search/
Similarities/): the index stores ONE thing — per-(field, doc) SmallFloat315
norm bytes + postings tfs + global stats — and a Similarity turns them into
scores. Both models here encode norms identically
(Byte315: BM25Similarity.EncodeNormValue and DefaultSimilarity.EncodeNormValue
both call SmallFloat.SingleToByte315(boost/sqrt(length))), so one index
serves both.

- BM25Similarity (BM25Similarity.cs, k1=1.2 b=0.75): the engine default —
  queryNorm()==1, coord()==1, additive boolean scores. Its float32 kernels
  live in IndexSearcher (the hot path) and smallfloat.bm25_norm_cache.
- ClassicSimilarity (TFIDFSimilarity.cs + DefaultSimilarity.cs): the
  pre-BM25 default with the queryNorm path —
      idf(t)      = (float)(ln(maxDoc / (double)(df+1)) + 1)
      tf(f)       = (float)sqrt(f)
      queryWeight = idf * boost                      (f32)
      sumSq       = sum of queryWeight^2             (f32 accumulate)
      queryNorm   = (float)(1 / sqrt(sumSq))         (DefaultSimilarity.QueryNorm)
      value(t)    = (queryWeight * (queryNorm*tlb)) * idf      (IDFStats.Normalize)
      partial     = tf(freq) * value(t) * decode315(norm_byte) (TFIDFSimScorer.Score)
      doc score   = float(sum partials) * coord(overlap, maxOverlap)
  where decode315 is the RAW SmallFloat.Byte315ToSingle float (~1/sqrt(len))
  — not BM25's 1/f^2 — and coord = overlap/(float)maxOverlap
  (DefaultSimilarity.Coord; BooleanScorer2 coordFactors).
"""

from __future__ import annotations

import math

import numpy as np

from lucenenet_spark.index.smallfloat import byte315_to_float

f32 = np.float32


class BM25Similarity:
    """Marker + parameters; kernels implemented in IndexSearcher/smallfloat
    (reference: Search/Similarities/BM25Similarity.cs)."""

    name = "bm25"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b


class ClassicSimilarity:
    """TFIDF/DefaultSimilarity float kernels (driver-side scalar parts;
    the per-doc column expressions live in ClassicScoring)."""

    name = "classic"

    @staticmethod
    def idf_f32(df: int, max_doc: int) -> np.float32:
        return f32(math.log(max_doc / float(df + 1)) + 1.0)

    @staticmethod
    def idf_double(df: int, max_doc: int) -> float:
        return math.log(max_doc / float(df + 1)) + 1.0

    @staticmethod
    def query_norm_f32(sum_sq: np.float32) -> np.float32:
        return f32(1.0 / math.sqrt(float(sum_sq)))

    @staticmethod
    def coord_f32(overlap: int, max_overlap: int) -> np.float32:
        return f32(overlap / float(max_overlap))

    @staticmethod
    def decode_table_f32() -> np.ndarray:
        """DefaultSimilarity NORM_TABLE: raw Byte315ToSingle floats."""
        return byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)


def bm25_plus_scored(index, term: str, k1: float = 1.2, b: float = 0.75,
                     delta: float = 1.0, field: str | None = None):
    """BM25+ single-term scoring (Lv & Zhai, "Lower-bounding term
    frequency normalization", CIKM 2011): classic BM25 systematically
    UNDER-rewards occurrence in long documents — as dl grows, even the
    first occurrence's contribution decays toward 0, so a long doc
    containing the term can score below the no-occurrence baseline of a
    short one.  BM25+ adds a lower-bound constant delta to the
    saturated tf component:

        score = idf * ( (k1+1)·tf / (tf + K) + delta ),
        K = k1·((1-b) + b·dl/avgdl)

    with delta = 1.0 (the paper's recommended default).  Joins the
    similarity seam beside BM25/Classic/LM/DFR/IB/SweetSpot; same
    double-mode idf and norm arithmetic as the engine's other kernels,
    one whole-stage-codegen expression over the postings scan.
    Returns (doc_id, score).
    """
    from pyspark.sql import functions as F

    fld = field or index.default_field
    stats = index.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    n = float(index.max_doc)
    avgdl = index.avgdl_double_for(fld)
    p = index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    kk = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = idf * (F.lit(k1 + 1.0) * tf / (tf + kk) + F.lit(delta))
    return p.crossJoin(F.broadcast(stats)).select("doc_id", score.alias("score"))


def pivoted_norm_scored(index, term: str, slope: float = 0.2,
                        field: str | None = None):
    """Pivoted-normalization VSM (Singhal, Buckley & Mitra, "Pivoted
    Document Length Normalization", SIGIR 1996) for a single-term
    query with qtf = 1 — the Lnu.ltu weighting that preceded BM25 as
    the SMART default:

        score = (1 + ln(1 + ln(tf)))
                / ((1 - s) + s * dl / avgdl)
                * ln((N + 1) / df)

    The double-log tf dampening and the pivoted (slope-s) length
    normalizer are the paper's equations 2-4; s = 0.2 is the published
    default.  Same exact-stats seam as every similarity here: df/tf/dl
    integers, one double formula.
    """
    from pyspark.sql import functions as F

    fld = field or index.default_field
    stats = index.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    n = float(index.max_doc)
    avgdl = index.avgdl_double_for(fld)
    p = index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
    tf = F.col("tf").cast("double")
    w_tf = F.lit(1.0) + F.log(F.lit(1.0) + F.log(tf))
    norm = F.lit(1.0 - slope) + F.lit(slope) * F.col("dl").cast("double") / F.lit(avgdl)
    idf = F.log((F.lit(n) + F.lit(1.0)) / F.col("df").cast("double"))
    score = w_tf / norm * idf
    return p.crossJoin(F.broadcast(stats)).select("doc_id", score.alias("score"))


def dfi_scored(index, term: str, field: str | None = None):
    """Divergence-from-independence ranking (Kocabaş, Dinçer &
    Karaoğlan, "A nonparametric term weighting approach to information
    retrieval: divergence from independence", Information Retrieval
    17(2), 2014 — the standardized measure), the DFISimilarity model:

        E     = (ttf + 1) * dl / (sttf + 1)     expected tf under
                                                 term-document independence
        score = log2( (tf - E) / sqrt(E) + 1 )   when tf > E, else 0

    Documents at or below their expected frequency score zero and are
    dropped (the model's own stopword resistance: a term occurring at
    chance rate carries no evidence).  log2 is written ln(x)/ln(2) so
    both engines share one primitive.
    """
    from pyspark.sql import functions as F

    fld = field or index.default_field
    stats = index.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("ttf")
    sttf = float(index._sttf(fld))
    p = index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
    tf = F.col("tf").cast("double")
    e = (
        (F.col("ttf").cast("double") + F.lit(1.0))
        * F.col("dl").cast("double")
        / F.lit(sttf + 1.0)
    )
    measure = (tf - e) / F.sqrt(e)
    score = F.log(measure + F.lit(1.0)) / F.log(F.lit(2.0))
    return (
        p.crossJoin(F.broadcast(stats))
        .filter(tf > e)
        .select("doc_id", score.alias("score"))
    )


def two_stage_lm_scored(index, term: str, mu: float = 2000.0,
                        lam: float = 0.1, field: str | None = None):
    """Two-stage language-model smoothing (Zhai & Lafferty, "Two-Stage
    Language Models for Information Retrieval", SIGIR 2002): Dirichlet
    smoothing explains the DOCUMENT estimation problem, Jelinek-Mercer
    the QUERY noise — composing both fixes the single-λ sensitivity
    their SIGIR'01 study exposed:

        P(w|d)  = (tf + μ · P(w|C)) / (dl + μ)
        score   = ln( (1 - λ) · P(w|d) + λ · P(w|C) )

    with P(w|C) = ttf / sttf.  Complements the LMDirichlet and LMJM
    gates (the reference's Similarities/LMDirichletSimilarity.cs and
    LMJelinekMercerSimilarity.cs are each ONE stage of this).
    """
    from pyspark.sql import functions as F

    fld = field or index.default_field
    sttf = float(index._sttf(fld))
    stats = index.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("ttf")
    p = index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
    pc = F.col("ttf").cast("double") / F.lit(sttf)
    pwd = (F.col("tf").cast("double") + F.lit(mu) * pc) / (
        F.col("dl").cast("double") + F.lit(mu)
    )
    score = F.log(F.lit(1.0 - lam) * pwd + F.lit(lam) * pc)
    return p.crossJoin(F.broadcast(stats)).select("doc_id", score.alias("score"))
