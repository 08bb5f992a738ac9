"""ClassicSimilarity (TFIDF) query execution — the queryNorm/coord path.

Reference: Search/Similarities/TFIDFSimilarity.cs (809 LoC) +
DefaultSimilarity.cs; weight lifecycle per IndexSearcher.CreateNormalizedWeight
(GetValueForNormalization -> QueryNorm -> Normalize). Supported query subset:
TermQuery and BooleanQuery over TermQuery clauses (MUST / SHOULD / MUST_NOT,
minimumNumberShouldMatch) — the composition exercised by the reference's own
TestSimilarity.cs/TestBoolean2.cs suites. The same index serves BM25 and
Classic: both similarities quantize norms with SmallFloat315
(DefaultSimilarity.EncodeNormValue == BM25Similarity.EncodeNormValue).

Two modes, mirroring IndexSearcher:
- "lucene": float32 at every step the C# float path takes; norms decoded
  through the raw Byte315 table (DefaultSimilarity NORM_TABLE).
- "double": float64 with EXACT lengthNorm 1/sqrt(dl) (no quantization) —
  the DuckDB-oracle differential mode, structurally identical SQL.
"""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.queries import BooleanQuery, Occur, Query, TermQuery, rewrite
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.similarities import ClassicSimilarity

f32 = np.float32


class ClassicSearcher:
    """TFIDF/DefaultSimilarity scoring over an InvertedIndex."""

    def __init__(self, index: InvertedIndex, mode: str = "lucene"):
        assert mode in ("lucene", "double")
        self.index = index
        self.mode = mode
        self.sim = ClassicSimilarity()
        # reuse IndexSearcher's term-stats machinery (driver dict / pushdown)
        self._stats = IndexSearcher(index, mode="double")._term_stats
        if mode == "lucene":
            tbl = self.sim.decode_table_f32()
            self._decode_col = F.array(*[F.lit(float(v)) for v in tbl])

    # -------- per-posting factor hooks (SweetSpotSearcher overrides) ----
    def _tf_col_lucene(self):
        return F.sqrt(F.col("tf").cast("float")).cast("float")

    def _tf_col_double(self):
        return F.sqrt(F.col("tf").cast("double"))

    def _norm_col_lucene(self):
        return F.element_at(self._decode_col, F.col("norm_byte") + F.lit(1))

    def _norm_col_double(self):
        return F.lit(1.0) / F.sqrt(F.col("dl").cast("double"))

    # ------------------------------------------------------------- public
    def search(self, query: Query, k: int = 10) -> DataFrame:
        scored = self.scored(query)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def scored(self, query: Query) -> DataFrame:
        q = rewrite(query)
        if isinstance(q, TermQuery):
            q = BooleanQuery.of((q, Occur.MUST))
        if not isinstance(q, BooleanQuery) or not all(
            isinstance(c.query, TermQuery) for c in q.clauses
        ):
            raise TypeError(
                "ClassicSearcher supports TermQuery / BooleanQuery-of-terms"
            )
        fld = self.index.default_field
        musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
        nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
        if not musts and not shoulds:
            raise ValueError("pure-negation BooleanQuery matches nothing")
        for t in musts + shoulds + nots:
            if t.field and t.field != fld:
                raise TypeError("ClassicSearcher: default field only (v0)")
        scoring = musts + shoulds
        max_overlap = len(scoring)  # BooleanWeight maxCoord

        stats = self._stats([(fld, t.term) for t in scoring])
        n = self.index.max_doc
        tlb = q.boost

        # ---- weight lifecycle (CreateNormalizedWeight) ----
        if self.mode == "lucene":
            idfs = {id(t): self.sim.idf_f32(stats.get((fld, t.term), (0, 0))[0], n) for t in scoring}
            qw = {id(t): f32(idfs[id(t)] * f32(t.boost)) for t in scoring}
            sum_sq = f32(0.0)
            for t in scoring:
                sum_sq = f32(sum_sq + f32(qw[id(t)] * qw[id(t)]))
            sum_sq = f32(sum_sq * f32(f32(tlb) * f32(tlb)))  # BooleanWeight boost^2
            qn = self.sim.query_norm_f32(sum_sq) if sum_sq > 0 else f32(1.0)
            values = {
                id(t): float(f32(f32(qw[id(t)] * f32(qn * f32(tlb))) * idfs[id(t)]))
                for t in scoring
            }
        else:
            idfs = {id(t): self.sim.idf_double(stats.get((fld, t.term), (0, 0))[0], n) for t in scoring}
            qw = {id(t): idfs[id(t)] * t.boost for t in scoring}
            sum_sq = sum(w * w for w in qw.values()) * (tlb * tlb)
            qn = (1.0 / math.sqrt(sum_sq)) if sum_sq > 0 else 1.0
            values = {id(t): qw[id(t)] * (qn * tlb) * idfs[id(t)] for t in scoring}

        def partial(t: TermQuery) -> DataFrame:
            """(doc_id, _p) = tf(freq) * value * lengthNorm per matching doc
            (TFIDFSimScorer.Score)."""
            p = self.index.postings.filter(
                (F.col("field") == fld) & (F.col("term") == t.term)
            )
            v = values[id(t)]
            if self.mode == "lucene":
                tf_col = self._tf_col_lucene()
                dec = self._norm_col_lucene()
                sc = ((tf_col * F.lit(v).cast("float")).cast("float") * dec.cast("float")).cast("float")
            else:
                sc = self._tf_col_double() * F.lit(v) * self._norm_col_double()
            return p.select("doc_id", sc.cast("double").alias("_p"))

        req = None
        if musts:
            parts = [partial(m).withColumnRenamed("_p", f"_m{i}") for i, m in enumerate(musts)]
            req = reduce(lambda a, b: a.join(b, "doc_id"), parts)
            ssum = reduce(lambda a, c: a + c, [F.col(f"_m{i}") for i in range(len(musts))])
            req = req.select("doc_id", ssum.alias("score"), F.lit(len(musts)).alias("overlap"))

        opt = None
        if shoulds:
            parts = [partial(s) for s in shoulds]
            union = reduce(lambda a, b: a.unionByName(b), parts)
            opt = union.groupBy("doc_id").agg(
                F.sum("_p").alias("score"), F.count(F.lit(1)).alias("overlap")
            )

        msm = q.minimum_should_match
        if req is not None and opt is not None:
            out = req.join(
                opt.select(
                    "doc_id",
                    F.col("score").alias("opt_score"),
                    F.col("overlap").alias("opt_overlap"),
                ),
                "doc_id",
                "left",
            )
            if msm > 0:
                out = out.filter(F.coalesce(F.col("opt_overlap"), F.lit(0)) >= msm)
            out = out.select(
                "doc_id",
                (F.col("score") + F.coalesce(F.col("opt_score"), F.lit(0.0))).alias("score"),
                (F.col("overlap") + F.coalesce(F.col("opt_overlap"), F.lit(0))).alias("overlap"),
            )
        elif req is not None:
            out = req
        else:
            if msm > 0:
                opt = opt.filter(F.col("overlap") >= msm)
            out = opt

        for t in nots:
            excl = self.index.postings.filter(
                (F.col("field") == fld) & (F.col("term") == t.term)
            ).select("doc_id")
            out = out.join(excl, "doc_id", "left_anti")

        # coord(overlap, maxOverlap) multiplies the summed score
        # (BooleanScorer2 coordFactors; DefaultSimilarity.Coord)
        coord = (F.col("overlap").cast("double") / F.lit(float(max_overlap)))
        if self.mode == "lucene":
            score = (F.col("score").cast("float") * coord.cast("float")).cast("float").cast("double")
        else:
            score = F.col("score") * coord
        return out.select("doc_id", score.alias("score"))
