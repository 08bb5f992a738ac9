"""Language-model similarities behind the Similarity seam.

Reference: Search/Similarities/LMSimilarity.cs (+ LMDirichletSimilarity.cs,
LMJelinekMercerSimilarity.cs), built on SimilarityBase:
- collectionProbability cp(t) = (totalTermFreq + 1) / (numberOfFieldTokens + 1)
  (LMSimilarity.DefaultCollectionModel.ComputeProbability)
- Dirichlet (mu=2000 default):
    score = boost * (ln(1 + freq / (mu * cp)) + ln(mu / (docLen + mu)))
    clamped at 0 (LMDirichletSimilarity.Score)
- Jelinek-Mercer (lambda):
    score = boost * ln(1 + ((1-lambda) * freq / docLen) / (lambda * cp))
- docLen at score time = SimilarityBase.DecodeNormValue(norm_byte) — the
  QUANTIZED length 1/f315(b)^2 (NORM_TABLE), same byte the index already
  stores for BM25/Classic (SingleToByte315(boost/sqrt(numTerms))).
- SimilarityBase: coord == 1 and queryNorm == 1, so boolean composition is
  the plain additive sum — same shape as the BM25 planner.

Modes mirror IndexSearcher: "lucene" = double-interior ln, ONE float cast
per term score (the C# (float)(...) * boost path), quantized docLen;
"double" = float64 with exact dl (DuckDB-oracle differential)."""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.index.smallfloat import norm_table
from lucenenet_spark.search.queries import BooleanQuery, Occur, Query, TermQuery, rewrite
from lucenenet_spark.search.searcher import IndexSearcher

f32 = np.float32


def lm_dirichlet_score_scalar(
    freq: float, doc_len: float, ttf: int, field_tokens: int, mu: float = 2000.0,
    boost: float = 1.0,
) -> float:
    """Pure-scalar LMDirichletSimilarity.Score (golden-test oracle)."""
    # C# float-division order: (ttf + 1F) / (tokens + 1F) — each operand
    # rounds to float32 BEFORE the float32 divide (same cast-order class as
    # the round-2 encode_norm fix; up to 1 ulp vs dividing in double)
    cp = (f32(ttf) + f32(1.0)) / (f32(field_tokens) + f32(1.0))
    score = f32(boost) * f32(
        math.log(1 + freq / (mu * float(cp))) + math.log(mu / (doc_len + mu))
    )
    return float(score if score > 0.0 else f32(0.0))


_LOG2E = 1.4426950408889634  # SimilarityBase.Log2(Math.E)


def dfr_pl2_score_scalar(
    freq: float, doc_len: float, ttf: int, n_docs: int, avgdl: float,
    c: float = 1.0, boost: float = 1.0,
) -> float:
    """Pure-scalar DFRSimilarity(BasicModelP, AfterEffectL, NormalizationH2)
    — the PL2 model (DFRSimilarity.cs; golden value in
    TestSimilarityBase.TestPL2)."""
    tfn = f32(freq * math.log2(1.0 + c * avgdl / doc_len))
    # BasicModelP: lambda = (1L + ttf) float-divided by (1L + N) — integer
    # adds, float32 operands, float32 division (see lm_dirichlet note)
    lam = f32(1 + ttf) / f32(1 + n_docs)
    l_ae = f32(1.0 / (tfn + 1.0))
    p = f32(
        tfn * math.log2(tfn / float(lam))
        + (float(lam) + 1.0 / (12.0 * tfn) - tfn) * _LOG2E
        + 0.5 * math.log2(2.0 * math.pi * tfn)
    )
    return float(f32(f32(f32(boost) * p) * l_ae))


def lm_jm_score_scalar(
    freq: float, doc_len: float, ttf: int, field_tokens: int, lam: float = 0.1,
    boost: float = 1.0,
) -> float:
    """Pure-scalar LMJelinekMercerSimilarity.Score."""
    cp = (f32(ttf) + f32(1.0)) / (f32(field_tokens) + f32(1.0))
    return float(
        f32(boost) * f32(math.log(1 + ((1 - lam) * freq / doc_len) / (lam * float(cp))))
    )


def compose_terms_bool(index, q: BooleanQuery, fld: str, part, mode: str) -> DataFrame:
    """Shared SimilarityBase boolean composition (coord == queryNorm == 1,
    so scores are plain additive): MUST = N-way join + sum, SHOULD = union +
    groupBy sum with msm, MUST_NOT = left anti. `part(TermQuery) ->
    DataFrame[doc_id, _p]` supplies the per-term scorer — the Similarity
    seam. Used by LMSearcher and DFRSearcher."""
    musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
    shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
    nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
    if not musts and not shoulds:
        raise ValueError("pure-negation BooleanQuery matches nothing")
    req = None
    if musts:
        parts = [part(m).withColumnRenamed("_p", f"_m{i}") for i, m in enumerate(musts)]
        req = reduce(lambda a, b: a.join(b, "doc_id"), parts)
        ssum = reduce(lambda a, c: a + c, [F.col(f"_m{i}") for i in range(len(musts))])
        req = req.select("doc_id", ssum.alias("score"))
    opt = None
    if shoulds:
        union = reduce(lambda a, b: a.unionByName(b), [part(s) for s in shoulds])
        opt = union.groupBy("doc_id").agg(
            F.sum("_p").alias("score"), F.count(F.lit(1)).alias("n_should")
        )
    msm = q.minimum_should_match
    if req is not None and opt is not None:
        out = req.join(
            opt.select("doc_id", F.col("score").alias("opt"), "n_should"),
            "doc_id",
            "left",
        )
        if msm > 0:
            out = out.filter(F.coalesce(F.col("n_should"), F.lit(0)) >= msm)
        out = out.select(
            "doc_id", (F.col("score") + F.coalesce(F.col("opt"), F.lit(0.0))).alias("score")
        )
    elif req is not None:
        out = req
    else:
        if msm > 0:
            opt = opt.filter(F.col("n_should") >= msm)
        out = opt.select("doc_id", "score")
    for t in nots:
        excl = index.postings.filter(
            (F.col("field") == fld) & (F.col("term") == t.term)
        ).select("doc_id")
        out = out.join(excl, "doc_id", "left_anti")
    if mode == "lucene":
        out = out.select(
            "doc_id", F.col("score").cast("float").cast("double").alias("score")
        )
    return out


class LMSearcher:
    """LM-scored query execution (TermQuery / BooleanQuery-of-terms:
    additive composition, msm, MUST_NOT — SimilarityBase coord/queryNorm
    are identity)."""

    def __init__(self, index: InvertedIndex, model: str = "dirichlet",
                 mu: float = 2000.0, lam: float = 0.1, mode: str = "lucene",
                 c: float = 1.0):
        assert model in ("dirichlet", "jm", "pl2")
        self.c = c
        assert mode in ("lucene", "double")
        self.index = index
        self.model = model
        self.mu = mu
        self.lam = lam
        self.mode = mode
        self._stats = IndexSearcher(index, mode="double")._term_stats
        if mode == "lucene":
            # decoded quantized length table (NORM_TABLE = 1/f315(b)^2)
            tbl = norm_table().astype(np.float64)
            self._dl_col = F.element_at(
                F.array(*[F.lit(float(v)) for v in tbl]), F.col("norm_byte") + F.lit(1)
            )
        else:
            self._dl_col = F.col("dl").cast("double")

    def search(self, query: Query, k: int = 10) -> DataFrame:
        scored = self.scored(query)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _term_score_col(self, cp: float, boost: float):
        freq = F.col("tf").cast("double")
        dl = self._dl_col
        if self.model == "pl2":
            # cp here carries lambda = f32((1+ttf)/(1+N)); avgdl f32 literal
            avg = self._avgdl_f32
            tfn = (freq * F.log2(F.lit(1.0) + F.lit(self.c) * F.lit(avg) / dl))
            if self.mode == "lucene":
                tfn = tfn.cast("float").cast("double")
            l_ae = F.lit(1.0) / (tfn + F.lit(1.0))
            p = (
                tfn * F.log2(tfn / F.lit(cp))
                + (F.lit(cp) + F.lit(1.0) / (F.lit(12.0) * tfn) - tfn) * F.lit(1.4426950408889634)
                + F.lit(0.5) * F.log2(F.lit(2.0 * 3.141592653589793) * tfn)
            )
            if self.mode == "lucene":
                l_ae = l_ae.cast("float")
                p = p.cast("float")
                return (
                    (F.lit(float(f32(boost))).cast("float") * p).cast("float") * l_ae
                ).cast("float").cast("double")
            return F.lit(boost) * p * l_ae
        if self.model == "dirichlet":
            raw = F.log(F.lit(1.0) + freq / F.lit(self.mu * cp)) + F.log(
                F.lit(self.mu) / (dl + F.lit(self.mu))
            )
            if self.mode == "lucene":
                sc = F.lit(float(f32(boost))).cast("float") * raw.cast("float")
                sc = F.greatest(sc.cast("float"), F.lit(0.0).cast("float"))
                return sc.cast("double")
            return F.greatest(F.lit(boost) * raw, F.lit(0.0))
        raw = F.log(
            F.lit(1.0)
            + ((F.lit(1.0 - self.lam) * freq / dl) / F.lit(self.lam * cp))
        )
        if self.mode == "lucene":
            return (F.lit(float(f32(boost))).cast("float") * raw.cast("float")).cast(
                "float"
            ).cast("double")
        return F.lit(boost) * raw

    def scored(self, query: Query) -> DataFrame:
        q = rewrite(query)
        if isinstance(q, TermQuery):
            q = BooleanQuery.of((q, Occur.MUST))
        if not isinstance(q, BooleanQuery) or not all(
            isinstance(c.query, TermQuery) for c in q.clauses
        ):
            raise TypeError("LMSearcher supports TermQuery / BooleanQuery-of-terms")
        fld = self.index.default_field
        bad = {c.query.field for c in q.clauses if c.query.field and c.query.field != fld}
        if bad:
            # LM stats (field token count, avgdl) are bound to one field;
            # silently scoring another field's terms against them would be
            # wrong-field scores — fail loudly like ClassicSearcher does
            raise TypeError(f"LMSearcher scores field {fld!r} only, got {sorted(bad)}")
        field_tokens = self.index._sttf(fld)
        musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
        nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
        if not musts and not shoulds:
            raise ValueError("pure-negation BooleanQuery matches nothing")
        stats = self._stats([(fld, t.term) for t in musts + shoulds])
        # SimilarityBase.FillBasicStats: avgFieldLength = (float)tokens / N
        self._avgdl_f32 = float(f32(f32(field_tokens) / self.index.max_doc))

        def part(t: TermQuery) -> DataFrame:
            ttf = stats.get((fld, t.term), (0, 0))[1]
            if self.model == "pl2":
                # lambda = (1+ttf)/(1f+N) (BasicModelP): float32 operands,
                # float32 division — not a rounded double division
                cp = float(f32(1 + ttf) / f32(1 + self.index.max_doc))
            else:
                # cp computed as a float32 division then used as a double
                # literal, mirroring LMStats.CollectionProbability (a float
                # field assigned (ttf+1F)/(tokens+1F))
                cp = float((f32(ttf) + f32(1.0)) / (f32(field_tokens) + f32(1.0)))
            p = self.index.postings.filter(
                (F.col("field") == fld) & (F.col("term") == t.term)
            )
            return p.select(
                "doc_id",
                self._term_score_col(cp, t.boost * q.boost).alias("_p"),
            )

        return compose_terms_bool(self.index, q, fld, part, self.mode)
