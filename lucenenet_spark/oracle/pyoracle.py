"""Pure-Python single-node reference implementation (the differential oracle).

A tiny, slow, obviously-correct implementation of the exact same contract the
Spark engine implements — tokenize → postings → global stats → float32 BM25
with SmallFloat-315 quantized norms → top-k (score DESC, doc_id ASC).

Used by tests the way the reference uses CheckHits
(src/Lucene.Net.TestFramework/Search/CheckHits.cs): the distributed engine's
doc-id sets must be identical and scores equal as float32 (tolerance 1e-6
relative, mirroring EXPLAIN_SCORE_TOLERANCE_DELTA at CheckHits.cs:41).

Float semantics follow BM25Similarity.cs exactly:
  idf       float32( ln(1 + (N - df + .5)/(df + .5)) )
  avgdl     float32( sum_ttf / (double) maxDoc )
  cache[b]  k1*((1-b) + b*NORM_TABLE[b]/avgdl)           (float32 ops)
  weightVal float32(idf*boost*tlb) * float32(k1+1)
  score     weightVal*freq/(freq + cache[norm_byte])     (float32 ops)
  boolean   sum of clause scores in double, cast float32 (DisjunctionSumScorer)
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.index.smallfloat import bm25_norm_cache, encode_norm

f32 = np.float32


class PyIndex:
    def __init__(self, docs: dict[int, str], analyzer: StandardAnalyzer | None = None,
                 k1: float = 1.2, b: float = 0.75):
        self.analyzer = analyzer or StandardAnalyzer()
        self.k1, self.b = k1, b
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)  # term -> doc -> positions
        self.doclen: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = self.analyzer.tokenize_text(text)
            self.doclen[doc_id] = len(toks)
            for term, pos in toks:
                self.postings[term].setdefault(doc_id, []).append(pos)
        self.max_doc = len(docs)
        self.sum_ttf = sum(self.doclen.values())
        self.norm_byte = {
            d: int(encode_norm(np.array([l], dtype=np.int64))[0]) for d, l in self.doclen.items()
        }
        self.avgdl = f32(self.sum_ttf / float(self.max_doc)) if self.sum_ttf > 0 else f32(1.0)
        self.cache = bm25_norm_cache(float(self.avgdl), k1, b)

    # ---------------------------------------------------------------- stats
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> np.float32:
        d = self.df(term)
        return f32(math.log(1 + (self.max_doc - d + 0.5) / (d + 0.5)))

    def _weight_value(self, idf_sum: np.float32, boost: float, tlb: float) -> np.float32:
        w = f32(f32(f32(idf_sum) * f32(boost)) * f32(tlb))
        return f32(w * f32(f32(self.k1) + f32(1.0)))

    def _score(self, wv: np.float32, freq: int, doc_id: int) -> np.float32:
        fr = f32(freq)
        norm = self.cache[self.norm_byte[doc_id]]
        return f32(f32(f32(wv * fr)) / f32(fr + norm))

    # ---------------------------------------------------------------- queries
    def term_scores(self, term: str, boost: float = 1.0, tlb: float = 1.0) -> dict[int, float]:
        wv = self._weight_value(self.idf(term), boost, tlb)
        return {
            d: float(self._score(wv, len(ps), d)) for d, ps in self.postings.get(term, {}).items()
        }

    def phrase_scores(self, terms: list[str], positions: list[int] | None = None,
                      boost: float = 1.0, tlb: float = 1.0) -> dict[int, float]:
        positions = positions if positions is not None else list(range(len(terms)))
        idf_sum = f32(0.0)
        for t in terms:
            idf_sum = f32(idf_sum + self.idf(t))
        wv = self._weight_value(idf_sum, boost, tlb)
        docsets = [set(self.postings.get(t, {})) for t in terms]
        out: dict[int, float] = {}
        for d in set.intersection(*docsets) if docsets else set():
            sets = [
                {p - r for p in self.postings[t][d]} for t, r in zip(terms, positions)
            ]
            freq = len(set.intersection(*sets))
            if freq > 0:
                out[d] = float(self._score(wv, freq, d))
        return out

    def sloppy_phrase_scores(
        self, terms: list[str], slop: int, positions: list[int] | None = None,
        boost: float = 1.0, tlb: float = 1.0,
    ) -> dict[int, float]:
        """SloppyPhraseScorer freq (faithful PhraseFreq walk incl. repeats,
        search/sloppy.py) + BM25 with float freq (SloppyFreq = 1/(1+d))."""
        from lucenenet_spark.search.sloppy import sloppy_phrase_freq

        positions = positions if positions is not None else list(range(len(terms)))
        idf_sum = f32(0.0)
        for t in terms:
            idf_sum = f32(idf_sum + self.idf(t))
        wv = self._weight_value(idf_sum, boost, tlb)
        docsets = [set(self.postings.get(t, {})) for t in terms]
        out: dict[int, float] = {}
        for d in set.intersection(*docsets) if docsets else set():
            its = [sorted(p - r for p in self.postings[t][d]) for t, r in zip(terms, positions)]
            acc = sloppy_phrase_freq(its, list(positions), slop, terms=list(terms), use_f32=True)
            if acc > 0:
                fr = f32(acc)
                norm = self.cache[self.norm_byte[d]]
                out[d] = float(f32(f32(f32(wv * fr)) / f32(fr + norm)))
        return out

    def boolean(
        self,
        musts: list[dict[int, float]] = (),
        shoulds: list[dict[int, float]] = (),
        not_docs: set[int] = frozenset(),
        minimum_should_match: int = 0,
    ) -> dict[int, float]:
        """Double accumulate + float cast (BooleanScorer2/DisjunctionSumScorer)."""
        if musts:
            docs = set.intersection(*[set(m) for m in musts])
        else:
            docs = set().union(*[set(s) for s in shoulds])
        out = {}
        for d in docs:
            if d in not_docs:
                continue
            n_should = sum(1 for s in shoulds if d in s)
            if minimum_should_match > 0 and n_should < minimum_should_match:
                continue
            acc = 0.0
            for m in musts:
                acc += m[d]
            for s in shoulds:
                if d in s:
                    acc += s[d]
            out[d] = float(f32(acc))
        return out

    @staticmethod
    def topk(scores: dict[int, float], k: int = 10) -> list[tuple[int, float]]:
        """score DESC, doc_id ASC (HitQueue.cs:88)."""
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    # ------------------------------------------------- ClassicSimilarity
    def classic_scores(
        self,
        musts: list[tuple[str, float]] = (),
        shoulds: list[tuple[str, float]] = (),
        nots: list[str] = (),
        minimum_should_match: int = 0,
        tlb: float = 1.0,
    ) -> dict[int, float]:
        """TFIDF/DefaultSimilarity with queryNorm + coord, float32 per op
        (TFIDFSimilarity.cs IDFStats/TFIDFSimScorer; DefaultSimilarity.cs:
        Tf=sqrt, Idf=ln(N/(df+1))+1, QueryNorm=1/sqrt(sumSq),
        Coord=overlap/maxOverlap; norms decoded via raw Byte315ToSingle)."""
        from lucenenet_spark.index.smallfloat import byte315_to_float

        decode = byte315_to_float(np.arange(256, dtype=np.uint8)).astype(np.float32)
        scoring = list(musts) + list(shoulds)
        max_overlap = len(scoring)
        n = self.max_doc
        idfs = [f32(math.log(n / float(self.df(t) + 1)) + 1.0) for t, _ in scoring]
        qw = [f32(i * f32(b)) for i, (_, b) in zip(idfs, scoring)]
        sum_sq = f32(0.0)
        for w in qw:
            sum_sq = f32(sum_sq + f32(w * w))
        sum_sq = f32(sum_sq * f32(f32(tlb) * f32(tlb)))
        qn = f32(1.0 / math.sqrt(float(sum_sq))) if sum_sq > 0 else f32(1.0)
        values = [f32(f32(w * f32(qn * f32(tlb))) * i) for w, i in zip(qw, idfs)]

        def partial(term: str, value: np.float32, d: int) -> np.float32:
            freq = len(self.postings[term][d])
            tf = f32(math.sqrt(f32(freq)))
            return f32(f32(tf * value) * decode[self.norm_byte[d]])

        must_sets = [set(self.postings.get(t, {})) for t, _ in musts]
        should_sets = [set(self.postings.get(t, {})) for t, _ in shoulds]
        if musts:
            docs = set.intersection(*must_sets) if must_sets else set()
        else:
            docs = set().union(*should_sets) if should_sets else set()
        not_docs = set().union(*[set(self.postings.get(t, {})) for t in nots]) if nots else set()
        out: dict[int, float] = {}
        for d in sorted(docs):
            if d in not_docs:
                continue
            n_should = sum(1 for s in should_sets if d in s)
            if musts and any(d not in m for m in must_sets):
                continue
            if minimum_should_match > 0 and n_should < minimum_should_match:
                continue
            acc = 0.0
            overlap = 0
            for (t, _), v in zip(scoring, values):
                if d in self.postings.get(t, {}):
                    acc += float(partial(t, v, d))
                    overlap += 1
            coord = f32(overlap / float(max_overlap))
            out[d] = float(f32(f32(acc) * coord))
        return out
