"""Serving path over the PACKED block index: term / OR / AND / phrase
top-k with block-max pruning (multi-term WAND) and skip-list-style
block-range intersection.

Why this exists: the exploded postings table (one row per (term, doc))
costs ~10x storage and scan versus 128-doc packed blocks at web scale;
serving from blocks is the production layout (reference physical design:
Codecs/Lucene41/Lucene41PostingsFormat.cs BLOCK_SIZE=128 + skip lists
Codecs/MultiLevelSkipListWriter.cs; pruning per Ding & Suel SIGIR'11
block-max WAND — Lucene 4.8 itself has no max-score metadata).

The enabling property: block_id = doc_id // BLOCK_SIZE, so EVERY term's
block b covers the same doc range [b*128, (b+1)*128). Aligned block-max
bounds therefore compose by block_id:

  OR :  score(doc in b) <= sum over query terms t present in b of ub_t(b)
  AND:  a doc matches only if every MUST term has a block b — candidate
        blocks = block_ids where all terms are present (the Advance()/
        skip-list analogue); same summed-ub bound.

Execution model (the round-3 redesign): block METADATA — (block_id,
n_docs, block-max pair, capped impact list) per (field, term) — lives in
a driver-side dictionary, exactly as the reference keeps the FST term
index and skip data memory-resident per open SegmentReader
(BlockTreeTermsReader / Lucene41SkipReader). The WAND threshold and the
pruning decision are then pure driver arithmetic — ZERO Spark actions
before the caller's own:

  1. THETA from metadata alone: each (term, block)'s impact list holds
     its top distinct (tf, norm_byte) pairs WITH exact doc counts — the
     term's per-doc score distribution. Sorting a term's impact scores
     descending and accumulating counts to k yields g_t, a score >= k
     distinct docs are guaranteed to reach; theta = max_t g_t.
  2. PRUNE: surviving block_ids = {b : ub_sum(b) >= theta*(1-eps)} —
     driver arithmetic, applied as an IN-list pushdown filter; the
     returned LAZY plan explodes + scores only surviving blocks, fully
     inside whole-stage codegen (the columnar in-block arrays, not the
     varint bytes, feed the query path — no Python decode per query).

Cost per query: driver arithmetic + the caller's ONE action on the
returned top-k plan (the same single-job shape as the exploded path, but
scanning only surviving blocks). Pruning stats are free (driver
arithmetic), so last_stats is always populated.

Scale guard: the metadata dict is bounded by meta_cache_max_rows; a term
whose block count exceeds the bound (a stopword at 10^12 docs has ~10^8
blocks) falls back to the fully distributed two-phase plan below, which
never collects metadata — the same small/large dictionary split the
exploded searcher uses for term stats.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.blocks import BLOCK_SIZE, pack_postings
from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.index.smallfloat import bm25_norm_cache
from lucenenet_spark.search.searcher import IndexSearcher, _f32

_EPS = 1e-6
# above this many surviving block ids an IN-list predicate stops paying for
# itself — scan all candidate blocks instead (pruning that weak saves nothing)
_MAX_INLIST = 20_000


class BlockIndexSearcher:
    """Top-k serving over packed 128-doc blocks (mode='lucene' scoring —
    blocks carry the quantized norm byte, exactly what BM25 needs)."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame | None = None,
                 collect_stats: bool = False, meta_cache_max_rows: int = 2_000_000):
        """collect_stats matters only on the distributed fallback path,
        where pruning stats cost extra count() actions; the driver-metadata
        path fills last_stats for free. False (serving-latency mode) is the
        default. Every query kind returns ONE lazy pruned plan — the
        caller's action is the query's only Spark job."""
        self.index = index
        self.inner = IndexSearcher(index, mode="lucene")
        if blocks is None:
            blocks = pack_postings(
                index.postings,
                norm_cache=bm25_norm_cache(
                    index.avgdl_for(index.default_field), self.inner.k1, self.inner.b
                ),
            )
        self.blocks = blocks
        self.collect_stats = collect_stats
        self.meta_cache_max_rows = meta_cache_max_rows
        self.last_stats: dict = {}
        # (field, term) -> dict of numpy arrays {bid, nd, mtf, mnb}, or None
        # when the term's block count exceeds the cache bound
        self._meta: dict[tuple[str, str], dict | None] = {}
        self._meta_rows = 0
        self._caches: dict[str, np.ndarray] = {}

    # ------------------------------------------------------------- helpers
    def _cache_np(self, fld: str) -> np.ndarray:
        if fld not in self._caches:
            self._caches[fld] = bm25_norm_cache(
                self.index.avgdl_for(fld), self.inner.k1, self.inner.b
            )
        return self._caches[fld]

    def _weights(self, term_boosts: dict[str, float], fld: str) -> dict[str, float]:
        stats = self.inner._term_stats([(fld, t) for t in term_boosts])
        return {
            t: self.inner._weight_value(
                self.inner._idf(stats.get((fld, t), (0, 0))[0]), b, 1.0
            )
            for t, b in term_boosts.items()
        }

    def _load_meta(self, fld: str, terms: list[str]) -> dict[str, dict | None]:
        """Driver-side block metadata per term (skip-list analogue).
        Returns {term: {bid, nd, mtf, mnb} | None}; None = too many blocks
        to cache (use the distributed path)."""
        missing = [t for t in terms if (fld, t) not in self._meta]
        if missing:
            rows = (
                self.blocks.filter(
                    (F.col("field") == fld) & (F.col("term").isin(missing))
                )
                .select("term", "block_id", "n_docs", "max_tf", "max_norm_byte",
                        "imp_tf", "imp_nb", "imp_cnt")
                .collect()
            )
            by_term: dict[str, list] = {t: [] for t in missing}
            for r in rows:
                by_term[r["term"]].append(
                    (r["block_id"], r["n_docs"], r["max_tf"], r["max_norm_byte"],
                     r["imp_tf"], r["imp_nb"], r["imp_cnt"])
                )
            for t, lst in by_term.items():
                if self._meta_rows + len(lst) > self.meta_cache_max_rows:
                    self._meta[(fld, t)] = None
                    continue
                lst.sort(key=lambda x: x[0])
                arr = np.array([x[:4] for x in lst], dtype=np.int64).reshape(-1, 4)
                # flattened impact multiset (block association not needed:
                # the threshold only consumes the term-wide distribution)
                self._meta[(fld, t)] = {
                    "bid": arr[:, 0], "nd": arr[:, 1],
                    "mtf": arr[:, 2], "mnb": arr[:, 3],
                    "itf": np.array([v for x in lst for v in x[4]], dtype=np.int64),
                    "inb": np.array([v for x in lst for v in x[5]], dtype=np.int64),
                    "icnt": np.array([v for x in lst for v in x[6]], dtype=np.int64),
                }
                self._meta_rows += len(lst)
        return {t: self._meta[(fld, t)] for t in terms}

    def _ub_arrays(self, meta: dict[str, dict], weights: dict[str, float],
                   fld: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Compose per-term block bounds into aligned per-block arrays:
        (block_ids, ub_sum, terms_present, n_docs_max), sorted by block_id.
        ub_t(b) = w_t * max_tf / (max_tf + cache[max_norm_byte]) — cache is
        DECREASING in norm_byte, so max_norm_byte gives the smallest norm."""
        cache = self._cache_np(fld).astype(np.float64)
        all_bids = np.unique(np.concatenate([m["bid"] for m in meta.values()]))
        ub_sum = np.zeros(len(all_bids), dtype=np.float64)
        present = np.zeros(len(all_bids), dtype=np.int64)
        nd_max = np.zeros(len(all_bids), dtype=np.int64)
        for t, m in meta.items():
            idx = np.searchsorted(all_bids, m["bid"])
            mt = m["mtf"].astype(np.float64)
            ub = weights[t] * mt / (mt + cache[m["mnb"]])
            ub_sum[idx] += ub
            present[idx] += 1
            nd_max[idx] = np.maximum(nd_max[idx], m["nd"])
        return all_bids, ub_sum, present, nd_max

    @staticmethod
    def _explode_cols(surv: DataFrame, with_positions: bool = False) -> DataFrame:
        """Columnar block -> per-posting rows, entirely inside whole-stage
        codegen (arrays_zip + explode of the int arrays; no Python)."""
        cols = ["doc_offs", "tfs", "nbs"] + (["poss"] if with_positions else [])
        ex = surv.select(
            "term", "block_id", F.explode(F.arrays_zip(*cols)).alias("e")
        )
        out = ex.select(
            "term",
            (F.col("block_id") * F.lit(BLOCK_SIZE) + F.col("e.doc_offs"))
            .cast("long")
            .alias("doc_id"),
            F.col("e.tfs").alias("tf"),
            F.col("e.nbs").alias("norm_byte"),
            *([F.col("e.poss").alias("positions")] if with_positions else []),
        )
        return out

    def _meta_theta(self, meta: dict[str, dict], weights: dict[str, float],
                    fld: str, k: int) -> float | None:
        """Guaranteed k-th-best-score threshold from the impact lists
        alone.  Per term t, the flattened impact multiset {(score, count)}
        is the term's EXACT per-doc score distribution (up to pairs beyond
        IMPACT_CAP, whose omission only weakens, never unsafes, the
        bound): sorting scores descending and accumulating counts to k
        gives g_t = a score >= the k-th best single-term contribution of
        >= k DISTINCT docs.  theta = max_t g_t — any doc's OR sum is >=
        its single-term contribution, so at least k docs score >= theta."""
        cache = self._cache_np(fld).astype(np.float64)
        theta = None
        for t, m in meta.items():
            if len(m["itf"]) == 0:
                continue
            s = weights[t] * m["itf"] / (m["itf"] + cache[m["inb"]])
            order = np.argsort(-s, kind="stable")
            covered = np.cumsum(m["icnt"][order])
            hit = np.searchsorted(covered, k)
            if hit >= len(order):
                continue
            g = float(s[order[hit]])
            if theta is None or g > theta:
                theta = g
        return theta

    def _scan_plan(self, terms: list[str], weights: dict[str, float], fld: str,
                   surviving: np.ndarray | None, k: int, mode: str,
                   n_terms: int) -> DataFrame:
        """The returned (lazy) plan: pushdown-filter surviving blocks,
        decode, score, top-k. No joins, no extra actions."""
        pred = (F.col("field") == fld) & F.col("term").isin(terms)
        if surviving is not None and len(surviving) <= _MAX_INLIST:
            pred = pred & F.col("block_id").isin([int(b) for b in surviving])
        decoded = self._explode_cols(self.blocks.filter(pred))
        wmap = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(float(w)))])
        per_term = decoded.select(
            "doc_id",
            self.inner._score_col_dynamic(wmap[F.col("term")], F.col("tf"), fld).alias("score"),
        )
        if n_terms == 1 and mode != "and":
            out = per_term.select(
                "doc_id", F.col("score").cast("float").cast("double").alias("score")
            )
        else:
            agg = per_term.groupBy("doc_id").agg(
                F.sum("score").alias("score"), F.count(F.lit(1)).alias("nt")
            )
            if mode == "and":
                agg = agg.filter(F.col("nt") >= n_terms)
            out = agg.select(
                "doc_id", F.col("score").cast("float").cast("double").alias("score")
            )
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _empty(self) -> DataFrame:
        return self.inner._empty_scored()

    def _driver_two_phase(self, meta: dict[str, dict], terms: list[str],
                          weights: dict[str, float], fld: str, k: int,
                          mode: str, n_terms: int) -> DataFrame:
        """Driver-arithmetic WAND: metadata-only theta + ub pruning, then
        ONE lazy plan over the surviving blocks. No Spark action happens
        here — serving cost is exactly the caller's single job."""
        bids, ub_sum, present, nd = self._ub_arrays(meta, weights, fld)
        if mode == "and":
            keep = present >= n_terms
            bids, ub_sum, nd = bids[keep], ub_sum[keep], nd[keep]
        total = len(bids)
        if total == 0:
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        theta = None
        if mode != "and":
            # AND: a block containing all terms still guarantees no single
            # doc matches, so metadata gives no safe theta — the candidate
            # intersection (skip-list Advance analogue) is the pruning.
            theta = self._meta_theta(meta, weights, fld, k)
        if theta is None:
            surviving = bids
        else:
            keep = ub_sum >= theta * (1.0 - _EPS)
            surviving = bids[keep]
        self.last_stats = {"blocks_total": total, "blocks_scored": len(surviving)}

        use = None if len(surviving) == total else surviving
        if mode == "and" and use is None:
            # the AND candidate set itself prunes blocks missing a term —
            # keep that pushdown even when theta prunes nothing further
            use = bids
        return self._scan_plan(terms, weights, fld, use, k, mode, n_terms)

    # ---------------------------------------------- distributed fallback
    def _metas(self, terms: list[str], weights: dict[str, float], fld: str) -> DataFrame:
        """Per-(term, block) metadata rows with the term's block upper
        bound — the fallback path when the metadata dict would not fit."""
        cache = self.inner._cache_col_for(fld)
        wmap = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(float(w)))])
        cmin = F.element_at(cache, F.col("max_norm_byte") + F.lit(1))
        mt = F.col("max_tf").cast("double")
        ub = (wmap[F.col("term")] * mt / (mt + cmin.cast("double"))).alias("ub")
        return self.blocks.filter(
            (F.col("field") == fld) & (F.col("term").isin(terms))
        ).select("field", "term", "block_id", "n_docs", "doc_offs", "tfs", "nbs", ub)

    def _score_decoded(self, metas: DataFrame, weights: dict[str, float], fld: str,
                       mode: str, n_terms: int = 0) -> DataFrame:
        decoded = self._explode_cols(metas)
        wmap = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(float(w)))])
        per_term = decoded.select(
            "doc_id",
            self.inner._score_col_dynamic(wmap[F.col("term")], F.col("tf"), fld).alias("score"),
        )
        agg = per_term.groupBy("doc_id").agg(
            F.sum("score").alias("score"), F.count(F.lit(1)).alias("nt")
        )
        if mode == "and":
            agg = agg.filter(F.col("nt") >= n_terms)
        return agg.select(
            "doc_id", F.col("score").cast("float").cast("double").alias("score")
        )

    def _two_phase(self, metas: DataFrame, weights: dict[str, float], fld: str,
                   k: int, mode: str, n_terms: int) -> DataFrame:
        """Distributed seed -> theta -> prune (fallback for terms whose
        block metadata exceeds the driver cache bound)."""
        by_block = metas.groupBy("block_id").agg(
            F.sum("ub").alias("ub_sum"),
            F.max("n_docs").alias("nd"),
            F.count(F.lit(1)).alias("terms_present"),
        )
        if mode == "and":
            by_block = by_block.filter(F.col("terms_present") >= n_terms)
        total = by_block.count() if self.collect_stats else None

        seed_rows = (
            by_block.select("block_id", "nd", "ub_sum")
            .orderBy(F.desc("ub_sum"), F.asc("block_id"))
            .limit(max(k, 4))
            .collect()
        )
        if not seed_rows:
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        covered, seed_ids = 0, []
        for r in seed_rows:
            seed_ids.append(r["block_id"])
            covered += r["nd"]
            if covered >= k and len(seed_ids) >= 4:
                break
        seed_metas = metas.filter(F.col("block_id").isin(seed_ids))
        seed_topk = (
            self._score_decoded(seed_metas, weights, fld, mode, n_terms)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_topk) < k:
            self.last_stats = {"blocks_total": total, "blocks_scored": total}
            out = self._score_decoded(metas, weights, fld, mode, n_terms)
            return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        theta = float(seed_topk[-1]["score"])

        surviving_ids = by_block.filter(
            F.col("ub_sum") >= F.lit(theta * (1.0 - _EPS))
        ).select("block_id")
        survivors = metas.join(surviving_ids, "block_id")
        n_scored = surviving_ids.count() if self.collect_stats else None
        self.last_stats = {"blocks_total": total, "blocks_scored": n_scored}
        out = self._score_decoded(survivors, weights, fld, mode, n_terms)
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ------------------------------------------------------------- public
    def topk_term(self, term: str, k: int = 10, boost: float = 1.0,
                  field: str | None = None) -> DataFrame:
        return self.topk_or({term: boost}, k, field)

    def topk_or(self, term_boosts: dict[str, float], k: int = 10,
                field: str | None = None) -> DataFrame:
        """Multi-term disjunction with aligned block-max WAND pruning
        (DisjunctionSumScorer semantics, scores rank-identical to
        IndexSearcher's OR)."""
        return self._topk(list(term_boosts), dict(term_boosts), k, field, "or")

    def topk_and(self, terms: list[str], k: int = 10,
                 field: str | None = None) -> DataFrame:
        """Conjunction: block-range intersection (every term present in
        the block — the skip-list Advance analogue) + summed-ub pruning
        (ConjunctionScorer semantics)."""
        return self._topk(list(terms), {t: 1.0 for t in terms}, k, field, "and")

    def _topk(self, terms: list[str], boosts: dict[str, float], k: int,
              field: str | None, mode: str) -> DataFrame:
        fld = field or self.index.default_field
        weights = self._weights(boosts, fld)
        n_terms = len(terms)
        meta = self._load_meta(fld, terms)
        live = {t: m for t, m in meta.items() if m is not None and len(m["bid"])}
        if any(m is None for m in meta.values()):
            metas = self._metas(terms, weights, fld)
            return self._two_phase(metas, weights, fld, k, mode, n_terms)
        if not live or (mode == "and" and len(live) < n_terms):
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        return self._driver_two_phase(live, list(live), weights, fld, k, mode, n_terms)

    def topk_phrase(self, terms: tuple[str, ...], k: int = 10,
                    field: str | None = None) -> DataFrame:
        """Exact phrase over packed blocks: candidate blocks = block_ids
        where ALL phrase terms are present (block-range intersection,
        computed from the driver metadata dict — zero extra actions);
        decode positions only for those; then the usual shifted-positions
        intersect (ExactPhraseScorer.cs) scored with summed idf."""
        fld = field or self.index.default_field
        stats = self.inner._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        idf_sum = np.float32(0.0)
        for t in terms:
            idf_sum = _f32(idf_sum + _f32(self.inner._idf(stats[(fld, t)][0])))
        wv = self.inner._weight_value(float(idf_sum), 1.0, 1.0)

        uniq = sorted(set(terms))
        meta = self._load_meta(fld, uniq)
        pred = (F.col("field") == fld) & F.col("term").isin(list(terms))
        cols = ["field", "term", "block_id", "doc_offs", "tfs", "nbs", "poss"]
        if all(m is not None for m in meta.values()):
            # candidate blocks = intersection of the terms' block-id sets
            # (skip-list Advance analogue) — driver arithmetic, no actions
            sets = [set(m["bid"].tolist()) if m is not None else set() for m in meta.values()]
            cand_ids = sorted(reduce(lambda a, b: a & b, sets)) if sets else []
            total = len(reduce(lambda a, b: a | b, sets)) if sets else 0
            self.last_stats = {"blocks_total": total, "blocks_scored": len(cand_ids)}
            if not cand_ids:
                return self._empty()
            if len(cand_ids) <= _MAX_INLIST:
                pred = pred & F.col("block_id").isin([int(b) for b in cand_ids])
            survivors = self.blocks.filter(pred).select(*cols)
        else:
            # fallback: distributed candidate intersection
            metas = self.blocks.filter(pred).select(*cols)
            cand = (
                metas.groupBy("block_id")
                .agg(F.count(F.lit(1)).alias("tp"))
                .filter(F.col("tp") >= len(set(terms)))
                .select("block_id")
            )
            if self.collect_stats:
                self.last_stats = {
                    "blocks_total": metas.select("block_id").distinct().count(),
                    "blocks_scored": cand.count(),
                }
            else:
                self.last_stats = {}
            survivors = metas.join(cand, "block_id")
        decoded = self._explode_cols(survivors, with_positions=True)

        def _shift(r: int):
            # NB: a 2-arg lambda in F.transform is called as (element,
            # INDEX) by PySpark — capture the slot offset via closure only
            return F.transform("positions", lambda x: x - F.lit(int(r)))

        parts = []
        for i, t in enumerate(terms):
            p = decoded.filter(F.col("term") == t).select(
                "doc_id",
                _shift(i).alias(f"adj_{i}"),
                *(["norm_byte"] if i == 0 else []),
            )
            parts.append(p)
        joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
        inter = reduce(
            lambda acc, i: F.array_intersect(acc, F.col(f"adj_{i}")),
            range(1, len(terms)),
            F.col("adj_0"),
        )
        joined = joined.withColumn("pf", F.size(inter)).filter(F.col("pf") > 0)
        scored = joined.select(
            "doc_id", self.inner._score_col(wv, F.col("pf"), fld).alias("score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
