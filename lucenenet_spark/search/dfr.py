"""Divergence-from-randomness + information-based similarity family.

Reference: Search/Similarities/DFRSimilarity.cs —
    score = totalBoost * basicModel(tfn) * afterEffect(tfn)
and IBSimilarity.cs —
    score = totalBoost * distribution(tfn, lambda(stats))
with tfn = normalization.Tfn(stats, freq, docLen), docLen the QUANTIZED
decoded length (SimilarityBase.DecodeNormValue of the shared Byte315 norm
— same byte BM25 stores).

Components (each a small closed-form; files under Search/Similarities/):
  basic models  BasicModel{BE,D,G,IF,In,Ine,P}.cs
  after effects AfterEffect{B,L}.cs + NoAfterEffect
  normalizations Normalization{H1,H2,H3,Z}.cs + NoNormalization
  IB distributions Distribution{LL,SPL}.cs, lambdas Lambda{DF,TTF}.cs

Float conventions mirror the C# structure: interior math in double
(SimilarityBase.Log2 = ln/ln2), with a float32 rounding at each
component boundary — tfn, basicModel, afterEffect, distribution are all
C# floats — and float-typed stats (lambda, avgFieldLength) rounded f32
where the reference declares them float. Scalar kernels below are the
golden-test oracles (reference expectations:
Lucene.Net.Tests/Search/Similarities/TestSimilarityBase.cs:487-601);
DFRSearcher builds the identical arithmetic as Spark Columns.

Composition: SimilarityBase has coord == queryNorm == 1, so boolean
queries are plain additive — shared with the LM family
(lm.py compose_terms_bool).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.index.smallfloat import norm_table
from lucenenet_spark.search.lm import compose_terms_bool
from lucenenet_spark.search.queries import BooleanQuery, Occur, Query, TermQuery, rewrite
from lucenenet_spark.search.searcher import IndexSearcher

f32 = np.float32
_LN2 = math.log(2.0)
_LOG2E = 1.4426950408889634  # Log2(Math.E)


def _log2(x: float) -> float:
    """SimilarityBase.Log2: Math.Log(x) / LOG_2 (double)."""
    return math.log(x) / _LN2


# ---------------------------------------------------------------- scalars
def tfn_scalar(norm: str, tf: float, dl: float, avg: float,
               ttf: int = 0, tokens: int = 0,
               c: float = 1.0, mu: float = 800.0, z: float = 0.30) -> np.float32:
    """Normalization.Tfn — float32 result, C# op order per model."""
    if norm == "none":
        return f32(tf)
    if norm == "h1":  # tf * avg / len, float ops
        return f32(tf) * f32(avg) / f32(dl)
    if norm == "h2":  # (float)(tf * Log2(1 + c*avg/len))
        inner = float(f32(f32(c) * f32(avg)) / f32(dl))
        return f32(tf * _log2(1.0 + inner))
    if norm == "h3":  # ((tf + mu*((ttf+1F)/(tokens+1F))) / (len+mu)) * mu
        cp = (f32(ttf) + f32(1.0)) / (f32(tokens) + f32(1.0))
        return (f32(tf) + f32(mu) * cp) / (f32(dl) + f32(mu)) * f32(mu)
    if norm == "z":  # (float)(tf * Pow(avg/len, z))
        return f32(tf * math.pow(float(f32(avg) / f32(dl)), float(f32(z))))
    raise ValueError(norm)


def basic_model_scalar(model: str, tfn: float, df: int, ttf: int, n_docs: int) -> np.float32:
    """BasicModel*.Score(stats, tfn) — float32 result."""
    t = float(tfn)
    if model == "be":
        Fv = ttf + 1.0 + t
        N = Fv + n_docs

        def _f(n: float, m: float) -> float:
            return (m + 0.5) * _log2(n / m) + (n - m) * _log2(n)

        return f32(-_log2((N - 1) * math.e) + _f(N + Fv - 1, N + Fv - t - 2) - _f(Fv, Fv - t))
    if model == "d":
        Fv = ttf + 1.0 + t
        phi = t / Fv
        nphi = 1.0 - phi
        p = 1.0 / (n_docs + 1)
        D = phi * _log2(phi / p) + nphi * _log2(nphi / (1 - p))
        return f32(D * Fv + 0.5 * _log2(1 + 2 * math.pi * t * nphi))
    if model == "g":
        Fv = ttf + 1.0
        lam = Fv / (n_docs + Fv)
        return f32(_log2(lam + 1) + t * _log2((1 + lam) / lam))
    if model == "if":
        return f32(tfn) * f32(_log2(1 + (n_docs + 1) / (ttf + 0.5)))
    if model == "in":
        return f32(tfn) * f32(_log2((n_docs + 1) / (df + 0.5)))
    if model == "ine":
        ne = n_docs * (1.0 - math.pow((n_docs - 1) / float(n_docs), ttf))
        return f32(tfn) * f32(_log2((n_docs + 1) / (ne + 0.5)))
    if model == "p":
        lam = f32(1 + ttf) / f32(1 + n_docs)
        return f32(
            t * _log2(t / float(lam))
            + (float(lam) + 1.0 / (12.0 * t) - t) * _LOG2E
            + 0.5 * _log2(2.0 * math.pi * t)
        )
    raise ValueError(model)


def after_effect_scalar(ae: str, tfn: float, df: int, ttf: int) -> np.float32:
    """AfterEffect*.Score — float32 result."""
    if ae == "none":
        return f32(1.0)
    if ae == "l":
        return f32(1.0) / (f32(tfn) + f32(1.0))
    if ae == "b":  # (F+1)/(n*(tfn+1)), F=ttf+1, n=df+1, float ops
        return f32(ttf + 1 + 1) / (f32(df + 1) * (f32(tfn) + f32(1.0)))
    raise ValueError(ae)


def dfr_score_scalar(model: str, ae: str, norm: str, *, tf: float, dl: float,
                     df: int, ttf: int, n_docs: int, avg: float,
                     c: float = 1.0, mu: float = 800.0, z: float = 0.30,
                     boost: float = 1.0) -> float:
    """DFRSimilarity.Score: boost * basic * afterEffect (float chain)."""
    tfn = tfn_scalar(norm, tf, dl, avg, ttf=ttf, c=c, mu=mu, z=z)
    b = basic_model_scalar(model, tfn, df, ttf, n_docs)
    a = after_effect_scalar(ae, tfn, df, ttf)
    return float(f32(boost) * b * a)


def ib_lambda_scalar(lam: str, df: int, ttf: int, n_docs: int) -> np.float32:
    """Lambda{DF,TTF}: (x + 1F) / (N + 1F) — float32 division."""
    x = df if lam == "df" else ttf
    return (f32(x) + f32(1.0)) / (f32(n_docs) + f32(1.0))


def ib_distribution_scalar(dist: str, tfn: float, lam: float) -> np.float32:
    """Distribution{LL,SPL}.Score — float32 result, double interior."""
    lam = float(f32(lam))
    t = float(f32(tfn))
    if dist == "ll":
        return f32(-math.log(lam / (t + lam)))
    if dist == "spl":
        if lam == 1.0:
            lam = float(f32(0.99))
        frac = float(f32(tfn) / (f32(tfn) + f32(1.0)))
        return f32(-math.log((math.pow(lam, frac) - lam) / (1.0 - lam)))
    raise ValueError(dist)


def ib_score_scalar(dist: str, lam: str, norm: str, *, tf: float, dl: float,
                    df: int, ttf: int, n_docs: int, avg: float, tokens: int = 0,
                    c: float = 1.0, mu: float = 800.0, z: float = 0.30,
                    boost: float = 1.0) -> float:
    """IBSimilarity.Score: boost * distribution(tfn, lambda)."""
    tfn = tfn_scalar(norm, tf, dl, avg, ttf=ttf, tokens=tokens, c=c, mu=mu, z=z)
    lv = ib_lambda_scalar(lam, df, ttf, n_docs)
    return float(f32(boost) * ib_distribution_scalar(dist, tfn, float(lv)))


# ------------------------------------------------------------ distributed
class DFRSearcher:
    """DFR / IB scored execution over TermQuery / BooleanQuery-of-terms.

    family='dfr' uses (model, after_effect, normalization); family='ib'
    uses (distribution, ib_lambda, normalization). Modes as elsewhere:
    'lucene' = float32 casts at the component boundaries + quantized
    docLen; 'double' = float64 on exact dl (for the DuckDB oracle
    differential), keeping only the float-typed per-term stats (lambda)
    at f32 — the same convention the LM gates pin.
    """

    def __init__(self, index: InvertedIndex, family: str = "dfr",
                 model: str = "p", after_effect: str = "l", norm: str = "h2",
                 distribution: str = "spl", ib_lambda: str = "ttf",
                 c: float = 1.0, mu: float = 800.0, z: float = 0.30,
                 mode: str = "lucene"):
        assert family in ("dfr", "ib")
        assert mode in ("lucene", "double")
        assert model in ("be", "d", "g", "if", "in", "ine", "p")
        assert after_effect in ("b", "l", "none")
        assert norm in ("h1", "h2", "h3", "z", "none")
        assert distribution in ("ll", "spl")
        assert ib_lambda in ("df", "ttf")
        self.index = index
        self.family = family
        self.model = model
        self.ae = after_effect
        self.norm = norm
        self.dist = distribution
        self.ib_lambda = ib_lambda
        self.c, self.mu, self.z = c, mu, z
        self.mode = mode
        self._stats = IndexSearcher(index, mode="double")._term_stats
        if mode == "lucene":
            tbl = norm_table().astype(np.float64)
            self._dl_col = F.element_at(
                F.array(*[F.lit(float(v)) for v in tbl]), F.col("norm_byte") + F.lit(1)
            )
        else:
            self._dl_col = F.col("dl").cast("double")

    # -- column builders (same op order as the scalar kernels; in double
    # -- mode the f32 casts are dropped, in lucene mode kept)
    def _r32(self, col):
        return col.cast("float").cast("double") if self.mode == "lucene" else col

    def _tfn_col(self, ttf: int, tokens: int):
        tf = F.col("tf").cast("double")
        dl = self._dl_col
        avg = self._avg
        if self.norm == "none":
            return self._r32(tf)
        if self.norm == "h1":
            return self._r32(tf * F.lit(avg) / dl)
        if self.norm == "h2":
            return self._r32(tf * F.log2(F.lit(1.0) + F.lit(self.c) * F.lit(avg) / dl))
        if self.norm == "h3":
            cp = float((f32(ttf) + f32(1.0)) / (f32(tokens) + f32(1.0)))
            return self._r32(
                (tf + F.lit(self.mu) * F.lit(cp)) / (dl + F.lit(self.mu)) * F.lit(self.mu)
            )
        if self.norm == "z":
            return self._r32(tf * F.pow(F.lit(avg) / dl, F.lit(self.z)))
        raise ValueError(self.norm)

    def _basic_col(self, tfn, df: int, ttf: int):
        n_docs = self.index.max_doc
        if self.model == "be":
            Fv = tfn + F.lit(ttf + 1.0)
            N = Fv + F.lit(float(n_docs))

            def _f(n, m):
                return (m + F.lit(0.5)) * F.log2(n / m) + (n - m) * F.log2(n)

            return self._r32(
                -F.log2((N - F.lit(1.0)) * F.lit(math.e))
                + _f(N + Fv - F.lit(1.0), N + Fv - tfn - F.lit(2.0))
                - _f(Fv, Fv - tfn)
            )
        if self.model == "d":
            Fv = tfn + F.lit(ttf + 1.0)
            phi = tfn / Fv
            nphi = F.lit(1.0) - phi
            p = 1.0 / (n_docs + 1)
            D = phi * F.log2(phi / F.lit(p)) + nphi * F.log2(nphi / F.lit(1.0 - p))
            return self._r32(
                D * Fv + F.lit(0.5) * F.log2(F.lit(1.0) + F.lit(2 * math.pi) * tfn * nphi)
            )
        if self.model == "g":
            Fv = ttf + 1.0
            lam = Fv / (n_docs + Fv)
            return self._r32(
                F.lit(_log2(lam + 1)) + tfn * F.lit(_log2((1 + lam) / lam))
            )
        if self.model == "if":
            return self._r32(tfn * F.lit(float(f32(_log2(1 + (n_docs + 1) / (ttf + 0.5))))))
        if self.model == "in":
            return self._r32(tfn * F.lit(float(f32(_log2((n_docs + 1) / (df + 0.5))))))
        if self.model == "ine":
            ne = n_docs * (1.0 - math.pow((n_docs - 1) / float(n_docs), ttf))
            return self._r32(tfn * F.lit(float(f32(_log2((n_docs + 1) / (ne + 0.5))))))
        if self.model == "p":
            lam = float(f32(1 + ttf) / f32(1 + n_docs))
            return self._r32(
                tfn * F.log2(tfn / F.lit(lam))
                + (F.lit(lam) + F.lit(1.0) / (F.lit(12.0) * tfn) - tfn) * F.lit(_LOG2E)
                + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * tfn)
            )
        raise ValueError(self.model)

    def _ae_col(self, tfn, df: int, ttf: int):
        if self.ae == "none":
            return F.lit(1.0)
        if self.ae == "l":
            return self._r32(F.lit(1.0) / (tfn + F.lit(1.0)))
        if self.ae == "b":
            return self._r32(
                F.lit(float(ttf + 2)) / (F.lit(float(df + 1)) * (tfn + F.lit(1.0)))
            )
        raise ValueError(self.ae)

    def _dist_col(self, tfn, lam: float):
        if self.dist == "ll":
            return self._r32(-F.log(F.lit(lam) / (tfn + F.lit(lam))))
        if self.dist == "spl":
            lam = float(f32(0.99)) if lam == 1.0 else lam
            frac = self._r32(tfn / (tfn + F.lit(1.0)))
            return self._r32(
                -F.log((F.pow(F.lit(lam), frac) - F.lit(lam)) / F.lit(1.0 - lam))
            )
        raise ValueError(self.dist)

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
            raise TypeError("DFRSearcher supports TermQuery / BooleanQuery-of-terms")
        fld = self.index.default_field
        bad = {c.query.field for c in q.clauses if c.query.field and c.query.field != fld}
        if bad:
            raise TypeError(f"DFRSearcher scores field {fld!r} only, got {sorted(bad)}")
        terms = [c.query for c in q.clauses if c.occur is not Occur.MUST_NOT]
        stats = self._stats([(fld, t.term) for t in terms])
        field_tokens = self.index._sttf(fld)
        # FillBasicStats: avgFieldLength = (float)tokens / N
        self._avg = float(f32(f32(field_tokens) / self.index.max_doc))
        self._tokens = field_tokens

        def part(t: TermQuery) -> DataFrame:
            df_, ttf = stats.get((fld, t.term), (0, 0))
            boost = t.boost * q.boost
            tfn = self._tfn_col(ttf, field_tokens)
            if self.family == "dfr":
                sc = self._basic_col(tfn, df_, ttf) * self._ae_col(tfn, df_, ttf)
            else:
                lam = float(ib_lambda_scalar(self.ib_lambda, df_, ttf, self.index.max_doc))
                sc = self._dist_col(tfn, lam)
            boost_lit = (
                F.lit(float(f32(boost))).cast("float").cast("double")
                if self.mode == "lucene"
                else F.lit(boost)
            )
            sc = self._r32(boost_lit * sc)
            p = self.index.postings.filter(
                (F.col("field") == fld) & (F.col("term") == t.term)
            )
            return p.select("doc_id", sc.alias("_p"))

        return compose_terms_bool(self.index, q, fld, part, self.mode)
