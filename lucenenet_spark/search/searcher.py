"""Query planner + executor: compiles the Query AST to DataFrame pipelines.

This is the engine's analogue of CreateNormalizedWeight + Scorer execution
(reference: src/Lucene.Net/Search/IndexSearcher.cs:328,740-781):

- stats binding: df/ttf for the query's terms are looked up once, globally
  (TermContext.Build, Index/TermContext.cs:90) — a tiny pushdown scan of the
  sorted term_stats table, the Spark analogue of a BlockTree term seek;
- leaf scorers: postings scans with a vectorized BM25 score column;
- boolean composition: AND = inner join on doc_id (ConjunctionScorer's
  leapfrog merge-join, Search/ConjunctionScorer.cs), OR = union + hash
  aggregate (DisjunctionSumScorer / bulk BooleanScorer bucket table,
  Search/BooleanScorer.cs:61-78), MUST_NOT = left anti join
  (ReqExclScorer), MUST+SHOULD = left outer join + coalesce
  (ReqOptSumScorer), minimumShouldMatch = HAVING count >= n
  (MinShouldMatchSumScorer);
- top-k: ORDER BY score DESC, doc_id ASC LIMIT k — Spark executes this as
  TakeOrdered (per-partition heap + single driver merge), exactly the
  reference's leaf-slice parallel search + HitQueue merge
  (IndexSearcher.cs:528-580; tie-break per HitQueue.cs:88).

Two scoring modes:
- "lucene": bit-parity BM25 — float32 arithmetic at every step the C#
  float path takes, quantized SmallFloat-315 norms via the 256-entry cache
  (BM25Similarity.cs ComputeWeight/BM25DocScorer).
- "double": same formula in float64 on exact doc lengths (no quantization);
  used for SQL-oracle differential checks (DuckDB computes the identical
  double expression).
"""

from __future__ import annotations

import math
import re
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.index.smallfloat import bm25_norm_cache
from lucenenet_spark.search.queries import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    Occur,
    PayloadTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)

K1 = 1.2
B = 0.75


def _f32(x) -> np.float32:
    return np.float32(x)


def _osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment (Damerau-Levenshtein without substring
    re-edits) — the distance FuzzyQuery uses when transpositions=true
    (reference: Util/Automaton/LevenshteinAutomata.cs builds the
    transposition automaton; an adjacent swap costs 1). Driver-side only,
    over the pruned candidate set."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return max(la, lb)
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


class IndexSearcher:
    def __init__(
        self,
        index: InvertedIndex,
        mode: str = "lucene",
        k1: float = K1,
        b: float = B,
        stats_cache_max_terms: int = 100_000,
        similarity: str = "bm25",
    ):
        """`similarity` is the Similarity seam (Search/Similarities/):
        "bm25" (default, BM25Similarity.cs k1/b) scores through this
        class's float32 kernels; "classic" (TFIDFSimilarity/
        DefaultSimilarity with the queryNorm + coord path) delegates
        scored()/search() to ClassicSearcher over the same index — both
        similarities read the same SmallFloat315 norm bytes."""
        assert mode in ("lucene", "double")
        assert similarity in ("bm25", "classic")
        self.index = index
        self.mode = mode
        self.k1 = k1
        self.b = b
        self.similarity = similarity
        self._classic = None
        if similarity == "classic":
            from lucenenet_spark.search.classic import ClassicSearcher

            self._classic = ClassicSearcher(index, mode=mode)
        # Driver-side term-stats dictionary: the analogue of keeping the FST
        # term index in RAM (Codecs/BlockTreeTermsReader). Loaded lazily on
        # first lookup when the dictionary is small enough; otherwise each
        # query does a pushdown scan (still O(|query terms|) rows read).
        # Saves one Spark job per query — the dominant cost of small-corpus
        # query latency.
        self._stats_cache_max_terms = stats_cache_max_terms
        self._stats_dict: dict[tuple[str, str], tuple[int, int]] | None = None
        self._stats_dict_checked = False
        # per-field 256-entry norm caches (avgdl is per field:
        # BM25Similarity.cs:91-102), built lazily, evaluated JVM-side
        self._cache_cols: dict[str, object] = {}
        # per-field term-trigram inverted table for fuzzy candidate
        # pruning (see _rewrite_fuzzy), built lazily + persisted
        self._fuzzy_grams: dict[str, DataFrame] = {}
        self._last_fuzzy_route: str | None = None

    def _fld(self, q) -> str:
        """Resolve a query's field, defaulting like QueryParserBase's
        field defaulting (Classic/QueryParserBase.cs)."""
        return getattr(q, "field", None) or self.index.default_field

    def _postings(self, fld: str) -> DataFrame:
        return self.index.postings.filter(F.col("field") == fld)

    def _cache_col_for(self, fld: str):
        if fld not in self._cache_cols:
            cache = bm25_norm_cache(self.index.avgdl_for(fld), self.k1, self.b)
            self._cache_cols[fld] = F.array(*[F.lit(float(v)) for v in cache])
        return self._cache_cols[fld]

    # ---------------------------------------------------------------- public
    def search(self, query: Query, k: int = 10) -> DataFrame:
        """Top-k: score DESC, doc_id ASC (TopScoreDocCollector.cs:30-34)."""
        scored = self.scored(query)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_after(
        self, after: tuple[float, int] | None, query: Query, k: int = 10
    ) -> DataFrame:
        """Deep pagination — IndexSearcher.SearchAfter
        (src/Lucene.Net/Search/IndexSearcher.cs:297-511) with the paging
        collector's keyset semantics (TopScoreDocCollector.cs:84-148): a hit
        qualifies iff score < after.score OR (score == after.score AND
        doc_id > after.doc) — the tie-break at TopScoreDocCollector.cs:112-114.

        `after` is the (score, doc_id) of the LAST hit of the previous page
        (None = first page).  The keyset predicate is composed into the same
        single-job top-k plan, so page N never re-collects pages 1..N-1 and
        never deepens the limit (no `limit(N*k)` blow-up at page depth)."""
        if after is None:
            return self.search(query, k)
        a_score, a_doc = float(after[0]), int(after[1])
        keyset = (F.col("score") < F.lit(a_score)) | (
            (F.col("score") == F.lit(a_score)) & (F.col("doc_id") > F.lit(a_doc))
        )
        return (
            self.scored(query)
            .filter(keyset)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def count(self, query: Query) -> int:
        """TotalHitCountCollector equivalent."""
        return self.docset(query).count()

    def search_text(self, query_string: str, k: int = 10, default_operator: str = "OR") -> DataFrame:
        """Parse with the classic syntax subset and search (the
        QueryParser + IndexSearcher composition of the reference demo,
        src/Lucene.Net.Demo/SearchFiles.cs:111-190)."""
        from lucenenet_spark.queryparser.parser import QueryParser

        q = QueryParser(default_operator=default_operator, analyzer=self.index.analyzer).parse(
            query_string
        )
        return self.search(q, k)

    def explain(self, term: str, doc_id: int, boost: float = 1.0, field: str | None = None) -> dict | None:
        """Score breakdown for one (field, term, doc) — Weight.Explain /
        BM25Similarity.ExplainScore analogue. Returns the components
        {tf, dl, norm_byte, idf, avgdl, norm, weight_value, score} or
        None when the doc doesn't contain the term."""
        fld = field or self.index.default_field
        row = (
            self._postings(fld)
            .filter((F.col("term") == term) & (F.col("doc_id") == doc_id))
            .select("tf", "dl", "norm_byte")
            .collect()
        )
        if not row:
            return None
        tf, dl, norm_byte = int(row[0]["tf"]), int(row[0]["dl"]), int(row[0]["norm_byte"])
        stats = self._term_stats([(fld, term)])
        df_, _ = stats.get((fld, term), (0, 0))
        idf = self._idf(df_)
        wv = self._weight_value(idf, boost, 1.0)
        if self.mode == "lucene":
            from lucenenet_spark.index.smallfloat import bm25_norm_cache

            norm = float(bm25_norm_cache(self.index.avgdl_for(fld), self.k1, self.b)[norm_byte])
            fr = _f32(tf)
            score = float(_f32(_f32(_f32(wv) * fr) / _f32(fr + _f32(norm))))
            avgdl = self.index.avgdl_for(fld)
        else:
            avgdl = self.index.avgdl_double_for(fld)
            norm = self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            score = wv * tf / (tf + norm)
        return {
            "field": fld,
            "term": term,
            "doc_id": doc_id,
            "tf": tf,
            "dl": dl,
            "norm_byte": norm_byte,
            "df": df_,
            "idf": float(idf),
            "avgdl": float(avgdl),
            "norm": float(norm),
            "weight_value": float(wv),
            "score": score,
        }

    def scored(self, query: Query) -> DataFrame:
        """DataFrame[doc_id, score] of all matching docs."""
        if self._classic is not None:
            return self._classic.scored(query)
        return self._scored(rewrite(query), tlb=1.0)

    def docset(self, query: Query) -> DataFrame:
        """Non-scoring matching-doc set (Filter equivalent)."""
        return self._docset(rewrite(query))

    # ------------------------------------------------------------- stats
    def _term_stats(
        self, terms: list[tuple[str, str]]
    ) -> dict[tuple[str, str], tuple[int, int]]:
        """Global (df, ttf) per (field, term) — TermContext.Build analogue.
        Driver dict when the dictionary fits; else pushdown filter on the
        term-sorted stats table (O(|terms|) rows either way)."""
        if not self._stats_dict_checked:
            self._stats_dict_checked = True
            # dictionary size comes from the index (memoized / persisted by
            # save()), so opening a searcher over a loaded index costs no
            # full term_stats action; the 100k default keeps the driver
            # dict tens-of-MB class — larger dictionaries use the pushdown
            # path below (O(|query terms|) rows read per query)
            n_terms = self.index.count_terms()
            if n_terms <= self._stats_cache_max_terms:
                # Arrow transfer (columnar, no per-row pickling)
                tbl = self.index.term_stats.toArrow()
                flds = tbl.column("field").to_pylist()
                terms_l = tbl.column("term").to_pylist()
                dfs = tbl.column("df").to_pylist()
                ttfs = tbl.column("ttf").to_pylist()
                self._stats_dict = {
                    (f, t): (int(d), int(tt))
                    for f, t, d, tt in zip(flds, terms_l, dfs, ttfs)
                }
        if self._stats_dict is not None:
            return {k: self._stats_dict[k] for k in set(terms) if k in self._stats_dict}
        uniq = sorted({t for _, t in terms})
        flds = sorted({f for f, _ in terms})
        rows = (
            self.index.term_stats.filter(F.col("term").isin(uniq))
            .filter(F.col("field").isin(flds))
            .collect()
        )
        want = set(terms)
        return {
            (r["field"], r["term"]): (int(r["df"]), int(r["ttf"]))
            for r in rows
            if (r["field"], r["term"]) in want
        }

    def _idf(self, df: int) -> float:
        """BM25Similarity.Idf: (float)log(1 + (N - df + .5)/(df + .5))."""
        n = self.index.max_doc
        val = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return float(_f32(val)) if self.mode == "lucene" else val

    def _weight_value(self, idf_sum: float, query_boost: float, tlb: float) -> float:
        """weightValue = idf * queryBoost * topLevelBoost * (k1 + 1)
        (BM25Stats.Normalize + BM25DocScorer ctor), float32 in lucene mode."""
        if self.mode == "lucene":
            w = _f32(_f32(_f32(idf_sum) * _f32(query_boost)) * _f32(tlb))
            return float(_f32(w * _f32(_f32(self.k1) + _f32(1.0))))
        return idf_sum * query_boost * tlb * (self.k1 + 1.0)

    def _norm_col(self, fld: str | None = None):
        """Per-doc length normalization k1*((1-b) + b*dl/avgdl(field)):
        quantized cache lookup in lucene mode (BM25DocScorer.Score),
        exact double expression in double mode."""
        fld = fld or self.index.default_field
        if self.mode == "lucene":
            return F.element_at(self._cache_col_for(fld), F.col("norm_byte") + F.lit(1))
        avgdl = self.index.avgdl_double_for(fld)
        return F.lit(self.k1) * (
            F.lit(1.0 - self.b) + F.lit(self.b) * F.col("dl").cast("double") / F.lit(avgdl)
        )

    def _score_col(self, weight_value: float, freq_col, fld: str | None = None):
        """score = weightValue * freq / (freq + norm)  (BM25DocScorer.Score),
        float32 at each op in lucene mode."""
        norm = self._norm_col(fld)
        if self.mode == "lucene":
            freq = freq_col.cast("float")
            num = (F.lit(weight_value).cast("float") * freq).cast("float")
            den = (freq + norm.cast("float")).cast("float")
            return (num / den).cast("float").cast("double")
        freq = freq_col.cast("double")
        return F.lit(weight_value) * freq / (freq + norm)

    # ------------------------------------------------------------- scorers
    def _scored(self, q: Query, tlb: float) -> DataFrame:
        if isinstance(q, PayloadTermQuery):
            return self._scored_payload_term(q, tlb)
        if isinstance(q, TermQuery):
            return self._scored_term(q, tlb)
        if isinstance(q, SynonymQuery):
            return self._scored_synonym(q, tlb)
        if isinstance(q, PhraseQuery):
            return self._scored_phrase(q, tlb)
        if isinstance(q, MultiPhraseQuery):
            return self._scored_multi_phrase(q, tlb)
        if isinstance(q, BooleanQuery):
            return self._scored_boolean(q, tlb)
        if isinstance(q, DisjunctionMaxQuery):
            return self._scored_dismax(q, tlb)
        if isinstance(q, MatchAllDocsQuery):
            return self._const_score(self.index.all_docs(), q.boost * tlb)
        if isinstance(q, ConstantScoreQuery):
            return self._const_score(self._docset(q.query), q.boost * tlb)
        if isinstance(q, FuzzyQuery):
            return self._scored(self._rewrite_fuzzy(q), tlb)
        if isinstance(q, MultiTermQuery):
            # CONSTANT_SCORE rewrite branch (MultiTermQuery.cs:95-147)
            return self._const_score(self._docset(q), q.boost * tlb)
        if isinstance(q, BoostQuery):
            return self._scored(q.query, tlb * q.boost)
        raise TypeError(f"unsupported query: {q!r}")

    def _const_score(self, docset: DataFrame, boost: float) -> DataFrame:
        val = float(_f32(boost)) if self.mode == "lucene" else float(boost)
        return docset.select("doc_id", F.lit(val).alias("score"))

    def _scored_term(self, q: TermQuery, tlb: float) -> DataFrame:
        fld = self._fld(q)
        stats = self._term_stats([(fld, q.term)])
        df_, _ = stats.get((fld, q.term), (0, 0))
        wv = self._weight_value(self._idf(df_), q.boost, tlb)
        p = self._postings(fld).filter(F.col("term") == q.term)
        return p.select("doc_id", self._score_col(wv, F.col("tf"), fld).alias("score"))

    def _scored_synonym(self, q: SynonymQuery, tlb: float) -> DataFrame:
        """SynonymQuery: one blended pseudo-term (see queries.SynonymQuery).

        freq = sum of the members' tfs in the doc (one groupBy over the
        members' postings — norm fields are per-doc constants, so max()
        re-attaches them without a second scan); weight idf uses the MAX
        member df, the blended document frequency."""
        if not q.terms:
            raise ValueError("SynonymQuery needs at least one term")
        if len(set(q.terms)) != len(q.terms):
            raise ValueError("SynonymQuery terms must be distinct")
        fld = self._fld(q)
        stats = self._term_stats([(fld, t) for t in q.terms])
        df_blend = max(stats.get((fld, t), (0, 0))[0] for t in q.terms)
        wv = self._weight_value(self._idf(df_blend), q.boost, tlb)
        p = self._postings(fld).filter(F.col("term").isin(list(q.terms)))
        norm_src = "norm_byte" if self.mode == "lucene" else "dl"
        agg = p.groupBy("doc_id").agg(
            F.sum("tf").alias("tf"), F.max(norm_src).alias(norm_src)
        )
        return agg.select("doc_id", self._score_col(wv, F.col("tf"), fld).alias("score"))

    def _scored_payload_term(self, q: PayloadTermQuery, tlb: float) -> DataFrame:
        """PayloadTermQuery: BM25 term kernel x payload function over the
        doc's per-occurrence payloads (Search/Payloads/PayloadTermQuery.cs
        + {Average,Min,Max}PayloadFunction.cs). The payload aggregate is a
        pure Column expression over the postings' payloads array — stays
        in whole-stage codegen, no UDF."""
        fld = self._fld(q)
        p = self._postings(fld).filter(F.col("term") == q.term)
        if "payloads" not in p.columns:
            raise ValueError(
                "index has no payloads column — build with a payload-emitting "
                "analyzer (e.g. DelimitedPayloadAnalyzer)"
            )
        pl = F.col("payloads")
        if q.function == "avg":
            agg = F.aggregate(
                pl, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ) / F.size(pl).cast("double")
        elif q.function == "min":
            agg = F.array_min(pl).cast("double")
        elif q.function == "max":
            agg = F.array_max(pl).cast("double")
        else:
            raise ValueError(f"unknown payload function: {q.function!r}")
        if q.include_span_score:
            stats = self._term_stats([(fld, q.term)])
            df_, _ = stats.get((fld, q.term), (0, 0))
            wv = self._weight_value(self._idf(df_), q.boost, tlb)
            score = self._score_col(wv, F.col("tf"), fld) * agg
        else:
            score = agg * F.lit(float(q.boost) * tlb)
        return p.select("doc_id", score.alias("score"))

    def _scored_terms_union(
        self, term_boosts: dict[str, float], tlb: float, fld: str | None = None
    ) -> DataFrame:
        """Single-scan disjunction over many same-field terms (flat OR /
        MultiTermQuery scoring rewrite): one postings scan with a per-term
        weight map — the planner's bulk BooleanScorer
        (Search/BooleanScorer.cs:61-78). Returns (doc_id, score=sum of
        per-term float32 scores as double, n_should=matched-clause count)."""
        fld = fld or self.index.default_field
        stats = self._term_stats([(fld, t) for t in term_boosts])
        weights = {
            t: self._weight_value(self._idf(stats.get((fld, t), (0, 0))[0]), tb, tlb)
            for t, tb in term_boosts.items()
        }
        mapping = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(w))])
        p = self._postings(fld).filter(F.col("term").isin(list(term_boosts)))
        per_term = p.select(
            "doc_id",
            self._score_col_dynamic(mapping[F.col("term")], F.col("tf"), fld).alias("score"),
        )
        return per_term.groupBy("doc_id").agg(
            F.sum("score").alias("score"), F.count(F.lit(1)).alias("n_should")
        )

    def _scored_terms_or(
        self, term_boosts: dict[str, float], tlb: float, fld: str | None = None
    ) -> DataFrame:
        out = self._scored_terms_union(term_boosts, tlb, fld).select("doc_id", "score")
        if self.mode == "lucene":
            out = out.select("doc_id", F.col("score").cast("float").cast("double").alias("score"))
        return out

    def _score_col_dynamic(self, weight_col, freq_col, fld: str | None = None):
        """Like _score_col but with a per-row (per-term) weight column."""
        norm = self._norm_col(fld)
        if self.mode == "lucene":
            freq = freq_col.cast("float")
            num = (weight_col.cast("float") * freq).cast("float")
            den = (freq + norm.cast("float")).cast("float")
            return (num / den).cast("float").cast("double")
        freq = freq_col.cast("double")
        return weight_col.cast("double") * freq / (freq + norm)

    # ------------------------------------------------------------- phrase
    def _scored_phrase(self, q: PhraseQuery, tlb: float) -> DataFrame:
        """ExactPhraseScorer (Search/ExactPhraseScorer.cs): N-way inner join
        of the phrase terms' postings on doc_id, then phrase frequency =
        |∩_i (positions_i - rel_i)| via array_intersect — all JVM-side.

        Weight uses the summed idf of the phrase terms
        (BM25Similarity.IdfExplain(TermStatistics[]), float32 accumulation).
        """
        if q.slop > 0:
            return self._scored_sloppy_phrase(q, tlb)
        fld = self._fld(q)
        terms = list(q.terms)
        rel = q.resolved_positions()
        stats = self._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            return self._empty_scored()
        if self.mode == "lucene":
            idf_sum = np.float32(0.0)
            for t in terms:
                idf_sum = _f32(idf_sum + _f32(self._idf(stats[(fld, t)][0])))
            idf_sum = float(idf_sum)
        else:
            idf_sum = sum(self._idf(stats[(fld, t)][0]) for t in terms)
        wv = self._weight_value(idf_sum, q.boost, tlb)

        def _shift(rr: int):
            return F.transform("positions", lambda x: x - F.lit(rr))

        parts = []
        for i, (t, r) in enumerate(zip(terms, rel)):
            p = self._postings(fld).filter(F.col("term") == t).select(
                F.col("doc_id"),
                _shift(int(r)).alias(f"adj_{i}"),
                *(["dl", "norm_byte"] if i == 0 else []),
            )
            parts.append(p)
        joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
        inter = reduce(
            lambda acc, i: F.array_intersect(acc, F.col(f"adj_{i}")),
            range(1, len(terms)),
            F.col("adj_0"),
        )
        joined = joined.withColumn("phrase_freq", F.size(inter)).filter(F.col("phrase_freq") > 0)
        return joined.select(
            "doc_id", self._score_col(wv, F.col("phrase_freq"), fld).alias("score")
        )

    def _scored_multi_phrase(self, q, tlb: float) -> DataFrame:
        """MultiPhraseQuery (Search/MultiPhraseQuery.cs): per slot i, the
        acceptable positions are the UNION of the slot's terms' position
        lists (UnionDocsAndPositionsEnum merges the postings of all slot
        terms); then the exact-phrase intersect runs on the per-slot unions.
        Weight = summed idf over EVERY term of every slot
        (MultiPhraseWeight ctor)."""
        fld = self._fld(q)
        arrays = [tuple(arr) for arr in q.term_arrays]
        rel = q.resolved_positions()
        all_terms = [t for arr in arrays for t in arr]
        stats = self._term_stats([(fld, t) for t in all_terms])
        # a slot with NO indexed term can never match; missing terms within
        # a slot just contribute nothing (idf of df=0 still added, as the
        # reference sums idf over the query's terms regardless)
        if any(all((fld, t) not in stats for t in arr) for arr in arrays):
            return self._empty_scored()
        if self.mode == "lucene":
            idf_sum = np.float32(0.0)
            for t in all_terms:
                idf_sum = _f32(idf_sum + _f32(self._idf(stats.get((fld, t), (0, 0))[0])))
            idf_sum = float(idf_sum)
        else:
            idf_sum = sum(self._idf(stats.get((fld, t), (0, 0))[0]) for t in all_terms)
        wv = self._weight_value(idf_sum, q.boost, tlb)

        parts = []
        for i, (arr, r) in enumerate(zip(arrays, rel)):
            # slot union: one scan of the slot's terms; flatten+dedup the
            # shifted position arrays per doc (UnionDocsAndPositionsEnum)
            p = (
                self._postings(fld)
                .filter(F.col("term").isin(list(arr)))
                .groupBy("doc_id")
                .agg(
                    F.array_sort(
                        F.array_distinct(
                            F.flatten(
                                F.collect_list(
                                    F.transform("positions", lambda x: x - F.lit(int(r)))
                                )
                            )
                        )
                    ).alias(f"adj_{i}"),
                    F.first("dl").alias(f"_dl_{i}"),
                    F.first("norm_byte").alias(f"_nb_{i}"),
                )
            )
            if i == 0:
                p = p.withColumnRenamed("_dl_0", "dl").withColumnRenamed("_nb_0", "norm_byte")
            else:
                p = p.drop(f"_dl_{i}", f"_nb_{i}")
            parts.append(p)
        joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
        inter = reduce(
            lambda acc, i: F.array_intersect(acc, F.col(f"adj_{i}")),
            range(1, len(arrays)),
            F.col("adj_0"),
        )
        joined = joined.withColumn("phrase_freq", F.size(inter)).filter(F.col("phrase_freq") > 0)
        return joined.select(
            "doc_id", self._score_col(wv, F.col("phrase_freq"), fld).alias("score")
        )

    def _scored_sloppy_phrase(self, q: PhraseQuery, tlb: float) -> DataFrame:
        """SloppyPhraseScorer: sloppy freqs (see sloppy_phrase_freqs) fed
        into the BM25 score with the phrase terms' summed idf."""
        fld = self._fld(q)
        terms = list(q.terms)
        stats = self._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            return self._empty_scored()
        if self.mode == "lucene":
            idf_sum = np.float32(0.0)
            for t in terms:
                idf_sum = _f32(idf_sum + _f32(self._idf(stats[(fld, t)][0])))
            idf_sum = float(idf_sum)
        else:
            idf_sum = sum(self._idf(stats[(fld, t)][0]) for t in terms)
        wv = self._weight_value(idf_sum, q.boost, tlb)
        with_freq = self.sloppy_phrase_freqs(q)
        return with_freq.select(
            "doc_id", self._score_col(wv, F.col("freq"), fld).alias("score")
        )

    def sloppy_phrase_freqs(self, q: PhraseQuery) -> DataFrame:
        """SloppyPhraseScorer (Search/SloppyPhraseScorer.cs): same N-way
        doc_id join as the exact phrase, then the PhrasePositions min-queue
        walk per candidate doc computes sloppyFreq = sum of
        1/(1+matchLength) over windows with matchLength <= slop
        (BM25Similarity.SloppyFreq at BM25Similarity.cs:74-77).
        Returns (doc_id, freq, dl, norm_byte) with freq > 0.

        The walk (search/sloppy.py, a faithful PhraseFreq port incl. the
        repeated-terms collision machinery) runs in a mapInPandas batch —
        the genuinely iterator-ish part Spark can't express; everything
        around it is declarative.
        """
        import pandas as pd
        from pyspark.sql import types as T

        fld = self._fld(q)
        terms = list(q.terms)
        rel = q.resolved_positions()
        slop = q.slop
        stats = self._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            return (
                self.index.doclens.select(
                    "doc_id",
                    F.lit(0.0).alias("freq"),
                    F.col("dl"),
                    F.col("norm_byte"),
                ).limit(0)
            )

        def _shift(rr: int):
            return F.transform("positions", lambda x: x - F.lit(rr))

        parts = []
        for i, (t, r) in enumerate(zip(terms, rel)):
            p = self._postings(fld).filter(F.col("term") == t).select(
                F.col("doc_id"),
                _shift(int(r)).alias(f"adj_{i}"),
                *(["dl", "norm_byte"] if i == 0 else []),
            )
            parts.append(p)
        joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)

        n = len(terms)
        use_f32 = self.mode == "lucene"
        out_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("freq", T.DoubleType(), False),
                T.StructField("dl", T.IntegerType(), False),
                T.StructField("norm_byte", T.IntegerType(), False),
            ]
        )

        rel_list = [int(r) for r in rel]
        term_list = list(terms)

        def sloppy(batches):
            from lucenenet_spark.search.sloppy import sloppy_phrase_freq

            for pdf in batches:
                freqs = []
                for row in pdf.itertuples(index=False):
                    its = [sorted(getattr(row, f"adj_{i}")) for i in range(n)]
                    freqs.append(
                        sloppy_phrase_freq(
                            its, rel_list, slop, terms=term_list, use_f32=use_f32
                        )
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"].astype("int64"),
                        "freq": freqs,
                        "dl": pdf["dl"].astype("int32"),
                        "norm_byte": pdf["norm_byte"].astype("int32"),
                    }
                )

        return joined.mapInPandas(sloppy, out_schema).filter(F.col("freq") > 0)

    def _empty_scored(self) -> DataFrame:
        return (
            self.index.doclens.select("doc_id", F.lit(0.0).alias("score")).limit(0)
        )

    def count_field_docs(self, fld: str) -> DataFrame:
        """Docs with at least one token in `fld` (FieldValueFilter shape)."""
        return (
            self.index.doclens.filter((F.col("field") == fld) & (F.col("dl") > 0))
            .select("doc_id")
        )

    # ------------------------------------------------------------- boolean
    def _scored_boolean(self, q: BooleanQuery, tlb: float) -> DataFrame:
        tlb = tlb * q.boost
        musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
        shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
        nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
        if not q.clauses:
            # zero-clause boolean (e.g. empty NGramPhraseQuery rewrite)
            # matches no documents, like Lucene's empty BooleanQuery
            return self._empty_scored()
        if not musts and not shoulds:
            raise ValueError("pure-negation BooleanQuery matches nothing (as in Lucene)")

        # Flat OR of plain unboosted? — keep general: score each clause.
        req: DataFrame | None = None
        if musts:
            scored = [
                self._scored(m, tlb).select("doc_id", F.col("score").alias(f"_s{i}"))
                for i, m in enumerate(musts)
            ]
            req = reduce(lambda a, b: a.join(b, "doc_id"), scored)
            ssum = reduce(lambda a, c: a + c, [F.col(f"_s{i}") for i in range(len(musts))])
            req = req.select("doc_id", ssum.alias("score"))

        opt: DataFrame | None = None
        if shoulds:
            should_flds = {self._fld(s) for s in shoulds}
            if (
                all(type(s) is TermQuery for s in shoulds)
                and len(should_flds) == 1
                and len({s.term for s in shoulds}) == len(shoulds)
            ):
                # flat OR of distinct same-field terms: ONE postings scan
                # with a per-term weight map instead of per-clause scan +
                # union — the planner's bulk BooleanScorer
                # (BooleanScorer.cs:61-78)
                opt = self._scored_terms_union(
                    {s.term: s.boost for s in shoulds}, tlb, next(iter(should_flds))
                )
            else:
                scored = [self._scored(s, tlb) for s in shoulds]
                union = reduce(lambda a, b: a.unionByName(b), scored)
                opt = union.groupBy("doc_id").agg(
                    F.sum("score").alias("score"), F.count(F.lit(1)).alias("n_should")
                )

        msm = q.minimum_should_match
        if req is not None and opt is not None:
            # ReqOptSumScorer: left outer + coalesce(opt, 0)
            out = req.join(opt.withColumnRenamed("score", "opt_score"), "doc_id", "left")
            if msm > 0:
                out = out.filter(F.coalesce(F.col("n_should"), F.lit(0)) >= msm)
            out = out.select(
                "doc_id", (F.col("score") + F.coalesce(F.col("opt_score"), F.lit(0.0))).alias("score")
            )
        elif req is not None:
            out = req
        else:
            assert opt is not None
            if msm > 0:
                opt = opt.filter(F.col("n_should") >= msm)  # MinShouldMatchSumScorer
            out = opt.select("doc_id", "score")

        for n in nots:
            out = out.join(self._docset(n), "doc_id", "left_anti")  # ReqExclScorer

        if self.mode == "lucene":
            # boolean scorers accumulate in double, return float
            out = out.select("doc_id", F.col("score").cast("float").cast("double").alias("score"))
        return out

    def _scored_dismax(self, q: DisjunctionMaxQuery, tlb: float) -> DataFrame:
        tlb = tlb * q.boost
        scored = [self._scored(s, tlb) for s in q.queries]
        union = reduce(lambda a, b: a.unionByName(b), scored)
        agg = union.groupBy("doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        score = F.col("mx") + F.lit(q.tie_breaker) * (F.col("sm") - F.col("mx"))
        if self.mode == "lucene":
            score = score.cast("float").cast("double")
        return agg.select("doc_id", score.alias("score"))

    # ------------------------------------------------------------- docsets
    def _docset(self, q: Query) -> DataFrame:
        q = rewrite(q)
        if isinstance(q, TermQuery):
            return (
                self._postings(self._fld(q)).filter(F.col("term") == q.term).select("doc_id")
            )
        if isinstance(q, MultiTermQuery) and not isinstance(q, FuzzyQuery):
            pred = self._term_predicate(q)
            return self._postings(self._fld(q)).filter(pred).select("doc_id").distinct()
        if isinstance(q, FuzzyQuery):
            return self._docset(self._rewrite_fuzzy(q))
        if isinstance(q, MatchAllDocsQuery):
            return self.index.all_docs()
        if isinstance(q, ConstantScoreQuery):
            return self._docset(q.query)
        if isinstance(q, BooleanQuery):
            if not q.clauses:
                # empty boolean (e.g. empty NGramPhraseQuery rewrite)
                # matches no documents, like Lucene's empty BooleanQuery
                return self._empty_scored().select("doc_id")
            musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
            shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
            nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
            out = None
            if musts:
                out = reduce(lambda a, b: a.join(b, "doc_id"), [self._docset(m) for m in musts])
            # When MUSTs exist and minimumShouldMatch == 0, SHOULD clauses are
            # purely optional and must not constrain the match set
            # (BooleanScorer2 / ReqOptSumScorer semantics — mirrors
            # _scored_boolean's left-outer join).
            if shoulds and not (musts and q.minimum_should_match <= 0):
                union = reduce(lambda a, b: a.unionByName(b), [self._docset(s) for s in shoulds])
                msm = max(1, q.minimum_should_match)
                if msm > 1:
                    union = (
                        union.groupBy("doc_id")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .filter(F.col("n") >= msm)
                        .select("doc_id")
                    )
                else:
                    union = union.distinct()
                out = union if out is None else out.join(union, "doc_id", "left_semi")
            if out is None:
                raise ValueError("pure-negation BooleanQuery matches nothing")
            for n in nots:
                out = out.join(self._docset(n), "doc_id", "left_anti")
            return out.distinct()
        # fall back: anything scorable
        return self._scored(q, 1.0).select("doc_id")

    @staticmethod
    def _term_predicate(q: MultiTermQuery):
        """Compile a MultiTermQuery to a term-dictionary predicate —
        our automaton-intersection analogue (pushed to the parquet scan)."""
        col = F.col("term")
        if isinstance(q, PrefixQuery):
            return col.startswith(q.prefix)
        if isinstance(q, WildcardQuery):
            pat = re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".")
            return col.rlike(f"^{pat}$")
        if isinstance(q, RegexpQuery):
            return col.rlike(f"^(?:{q.regexp})$")  # Lucene regexps are anchored
        if isinstance(q, TermRangeQuery):
            conds = []
            if q.lower is not None:
                conds.append(col >= q.lower if q.include_lower else col > q.lower)
            if q.upper is not None:
                conds.append(col <= q.upper if q.include_upper else col < q.upper)
            return reduce(lambda a, b: a & b, conds) if conds else F.lit(True)
        raise TypeError(f"no term predicate for {q!r}")

    def explain_term(self, q: TermQuery, tlb: float = 1.0) -> DataFrame:
        """IndexSearcher.Explain for a TermQuery: the numeric leaves of the
        reference's Explanation tree as columns, one row per matching doc —
        score(doc) = boost x idf x tfNorm with
        tfNorm = freq*(k1+1) / (freq + k1*(1-b+b*fieldLength/avgFieldLength))
        (BM25Similarity.ExplainScore, Similarities/BM25Similarity.cs:338-371).
        Columns: doc_id, freq, field_length, idf, tf_norm, score. The whole
        explanation is the scoring plan re-projected — same scan, no extra
        jobs — so explaining k docs costs the same as scoring them."""
        fld = self._fld(q)
        stats = self._term_stats([(fld, q.term)])
        df_, _ = stats.get((fld, q.term), (0, 0))
        idf = self._idf(df_)
        norm = self._norm_col(fld)
        p = self._postings(fld).filter(F.col("term") == q.term)
        freq = F.col("tf").cast("double")
        tf_norm = freq * F.lit(self.k1 + 1.0) / (freq + norm)
        return p.select(
            "doc_id",
            F.col("tf").alias("freq"),
            F.col("dl").alias("field_length"),
            F.lit(float(idf)).alias("idf"),
            tf_norm.alias("tf_norm"),
            (F.lit(float(q.boost) * tlb * idf) * tf_norm).alias("score"),
        )

    def scored_scoring_rewrite(
        self, q: MultiTermQuery, tlb: float = 1.0, field: str | None = None
    ) -> DataFrame:
        """SCORING_BOOLEAN_QUERY_REWRITE (Search/ScoringRewrite.cs:36-75)
        executed without materializing the expansion: the compiled pattern
        predicate filters BOTH the term-stats scan (per-term df for idf)
        and the postings scan, the two join on term, and the per-doc
        disjunction sum is one groupBy — the expanded term set never
        leaves the executors, so the rewrite Lucene must cap at
        BooleanQuery.MaxClauseCount (1024, ScoringRewrite.cs:50
        CheckMaxClauseCount) runs unbounded here. The stats side is NOT
        force-broadcast (a loose wildcard can match millions of dictionary
        terms at web scale); AQE picks broadcast when the expansion is
        small. Returns (doc_id, score), the same contract as _scored."""
        fld = field or self.index.default_field
        pred = self._term_predicate(q)
        n = float(self.index.max_doc)
        ts = (
            self.index.term_stats
            .filter((F.col("field") == fld) & pred)
            .select("term", "df")
        )
        p = self._postings(fld).filter(pred).join(ts, "term")
        idf = F.log(
            F.lit(1.0)
            + (F.lit(n) - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        )
        if self.mode == "lucene":
            # weightValue = f32(f32(f32(idf)*f32(boost))*f32(tlb)) * f32(k1+1)
            w = idf.cast("float") * F.lit(_f32(q.boost)).cast("float")
            w = (w.cast("float") * F.lit(_f32(tlb)).cast("float")).cast("float")
            weight = (w * F.lit(_f32(_f32(self.k1) + _f32(1.0))).cast("float")).cast("float")
        else:
            weight = idf * F.lit(float(q.boost) * tlb * (self.k1 + 1.0))
        per_term = p.select(
            "doc_id",
            self._score_col_dynamic(weight, F.col("tf"), fld).alias("score"),
        )
        return per_term.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def scored_auto_rewrite(
        self, q: MultiTermQuery, tlb: float = 1.0, field: str | None = None,
        term_count_cutoff: int = 350, doc_count_percent: float = 0.1,
    ) -> DataFrame:
        """CONSTANT_SCORE_AUTO_REWRITE_DEFAULT
        (Search/ConstantScoreAutoRewrite.cs:106-160, default cutoffs 350
        terms / 0.1% of maxDoc): BOTH branches are constant-score — the
        reference wraps even the boolean branch in ConstantScoreQuery
        ("Strip scores", :131-139) — the cutoff only picks the execution
        shape. Cutoff fires when n_terms >= min(MaxClauseCount=1024,
        termCountCutoff) OR docVisitCount (= sum of matched terms' df,
        CutOffTermCollector:156) >= (int)(docCountPercent/100 * maxDoc);
        both statistics come from ONE aggregate over the pattern-filtered
        term-stats table (O(matching dictionary rows), no postings scan).

        Spark mapping of the two shapes: the filter branch pushes the
        compiled pattern predicate straight onto the postings scan; the
        boolean branch materializes the bounded (<350-row) pendingTerms
        list — exactly the list the reference accumulates — and pushes it
        as an IN-list, which parquet dictionary filters prune far better
        than a regex/startswith predicate. Same result set either way."""
        fld = field or self.index.default_field
        pred = self._term_predicate(q)
        ts = self.index.term_stats.filter((F.col("field") == fld) & pred)
        row = ts.agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.coalesce(F.sum("df"), F.lit(0)).alias("sum_df"),
        ).collect()[0]
        term_limit = min(1024, term_count_cutoff)
        doc_cutoff = int(doc_count_percent / 100.0 * self.index.max_doc)
        if row["n_terms"] >= term_limit or row["sum_df"] >= doc_cutoff:
            # CONSTANT_SCORE_FILTER_REWRITE
            return self._const_score(self._docset(q), q.boost * tlb)
        terms = [r["term"] for r in ts.select("term").collect()]
        docset = (
            self._postings(fld)
            .filter(F.col("term").isin(terms))
            .select("doc_id")
            .distinct()
        )
        return self._const_score(docset, q.boost * tlb)

    def rewrite_top_terms(
        self, q: MultiTermQuery, size: int, field: str | None = None
    ) -> BooleanQuery:
        """TOP_TERMS(size) bounded expansion (Search/TopTermsRewrite.cs:66-160):
        expand the pattern against the term dictionary and keep at most
        `size` terms by descending boost, equal boosts broken by term order
        — ScoreTerm.CompareTo reverses the bytes comparison at equal boost
        (TopTermsRewrite.cs:272-283), so the queue keeps the `size`
        lexicographically SMALLEST matching terms. Non-fuzzy MultiTermQuery
        expansions all carry constant boost 1.0, so the kept set here is
        exactly `ORDER BY term ASC LIMIT size` over the term-stats table
        with the compiled pattern predicate pushed to the parquet scan; the
        driver materializes only the `size`-row result — the same bound as
        the reference's priority queue. (FuzzyQuery's similarity-boosted
        top-terms path is _rewrite_fuzzy.) Returns the rewritten
        BooleanQuery of SHOULD TermQuery clauses, scored like any other
        disjunction (TopTermsScoringBooleanQueryRewrite)."""
        fld = field or self.index.default_field
        pred = self._term_predicate(q)
        kept = (
            self.index.term_stats
            .filter((F.col("field") == fld) & pred)
            .select("term")
            .orderBy(F.col("term").asc())
            .limit(int(size))
            .collect()
        )
        return BooleanQuery.of(
            *[(TermQuery(r["term"], field=fld), Occur.SHOULD) for r in kept]
        )

    _FUZZY_GRAM_N = 3

    def _fuzzy_candidate_terms(self, t: str, fld: str, lev_cap: int) -> DataFrame:
        """Bounded fuzzy candidate generation — the Spark analogue of
        FuzzyTermsEnum intersecting a Levenshtein automaton with the term
        dict (Search/FuzzyTermsEnum.cs, Util/Automaton/LevenshteinAutomata.cs
        :35-39) instead of enumerating every term.

        q-gram count filter in DISTINCT-gram space: one edit touches at
        most n gram positions, so it can wipe out at most n distinct gram
        TYPES of t — a term within levenshtein k of t therefore contains
        at least D - k*n of t's D distinct n-grams (the distinct-set form
        of the count filter of Gravano et al., VLDB'01; the positional
        multiset bound |t|-n+1-kn is NOT sound over distinct sets for
        repetitive terms like 'aaaaaaa'). When that lower bound is
        >= 1, candidates are drawn from a lazily built, persisted
        (gram, term) inverted table: an IN-list filter on the gram column
        selects only the slices for the query's |t|-n+1 grams (narrow,
        no shuffle; at 10^9-term scale the table would live as parquet
        bucketed by gram so the IN-list becomes real scan pruning), then a
        tiny groupBy(term) count >= threshold keeps only gram-sharing
        terms — levenshtein runs on that small set, not the dictionary.
        Short terms / large k (bound < 1) fall back to the full
        length-banded dictionary scan, which is exact and still JVM-side."""
        qgrams = sorted(
            {t[i : i + self._FUZZY_GRAM_N] for i in range(len(t) - self._FUZZY_GRAM_N + 1)}
        )
        thresh = len(qgrams) - lev_cap * self._FUZZY_GRAM_N
        if thresh < 1 or not qgrams:
            self._last_fuzzy_route = "scan"
            return self.index.term_stats
        if fld not in self._fuzzy_grams:
            terms = self.index.term_stats.filter(F.col("field") == fld).select(
                "field", "term"
            )
            grams = terms.select(
                "field",
                "term",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            F.sequence(
                                F.lit(0),
                                F.greatest(
                                    F.length("term") - self._FUZZY_GRAM_N, F.lit(0)
                                ),
                            ),
                            lambda i: F.col("term").substr(
                                i + F.lit(1), F.lit(self._FUZZY_GRAM_N)
                            ),
                        )
                    )
                ).alias("gram"),
            )
            # repartition on gram so each IN-list probe touches few
            # partitions' columnar batches (min/max pruning on the
            # persisted frame); the table is built once per searcher
            self._fuzzy_grams[fld] = grams.repartition("gram").persist()
        g = self._fuzzy_grams[fld]
        self._last_fuzzy_route = "ngram"
        matched = (
            g.filter(F.col("gram").isin(qgrams))
            .groupBy("field", "term")
            .agg(F.count(F.lit(1)).alias("_shared"))
            .filter(F.col("_shared") >= thresh)
            .select("field", "term")
        )
        # restore df/ttf shape expected by the caller's predicate
        return self.index.term_stats.join(matched, ["field", "term"], "left_semi")

    def _rewrite_fuzzy(self, q: FuzzyQuery) -> Query:
        """FuzzyQuery → top-terms boosted OR (FuzzyTermsEnum + TopTermsRewrite;
        boost = 1 - edits/min-term-length, FuzzyTermsEnum.cs).

        The candidate set comes from a pushdown scan of the term dictionary
        with JVM-side levenshtein + length-window pruning; only the
        ≤max_expansions winners are collected to the driver. Long terms
        route through a trigram count prefilter first
        (_fuzzy_candidate_terms) so the levenshtein never sees the whole
        dictionary.

        transpositions=True (the reference default, FuzzyQuery.cs:61) counts
        an adjacent swap as ONE edit (Damerau / optimal string alignment).
        Plain Levenshtein counts it as 2, so the JVM prune widens to
        2*max_edits (lev <= 2*dam always) and the exact OSA distance is
        computed on the small collected candidate set.
        """
        t = q.term
        fld = self._fld(q)
        lev_cap = 2 * q.max_edits if q.transpositions else q.max_edits
        pred = (
            (F.col("field") == fld)
            & (F.length("term") >= len(t) - q.max_edits)
            & (F.length("term") <= len(t) + q.max_edits)
        )
        if q.prefix_length > 0:
            pred = pred & F.col("term").startswith(t[: q.prefix_length])
        source = self._fuzzy_candidate_terms(t, fld, lev_cap)
        cand = (
            source.filter(pred)
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("dist") <= lev_cap)
            .select("term", "dist")
            .collect()
        )
        scored = []
        for r in cand:
            term = r["term"]
            dist = _osa_distance(term, t) if q.transpositions else int(r["dist"])
            if dist > q.max_edits:
                continue
            boost = 1.0 if dist == 0 else 1.0 - dist / min(len(term), len(t))
            scored.append((boost, term))
        scored.sort(key=lambda x: (-x[0], x[1]))
        top = scored[: q.max_expansions]
        if not top:
            return TermQuery(t + "\x00_nomatch", field=fld, boost=q.boost)
        from lucenenet_spark.search.queries import BooleanClause

        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(term, field=fld, boost=boost), Occur.SHOULD)
                for boost, term in top
            ),
            boost=q.boost,
        )
