"""Serving path over the PACKED block index: term / OR / AND / phrase
top-k with block-max pruning (multi-term WAND) and skip-list-style
block-range intersection.

Why this exists: the exploded postings table (one row per (term, doc))
costs ~10x storage and scan versus 128-doc packed blocks at web scale;
serving from blocks is the production layout (reference physical design:
Codecs/Lucene41/Lucene41PostingsFormat.cs BLOCK_SIZE=128 + skip lists
Codecs/MultiLevelSkipListWriter.cs; pruning per Ding & Suel SIGIR'11
block-max WAND — Lucene 4.8 itself has no max-score metadata).

Layout (see index/blocks.py): a block is a run of <= 128 CONSECUTIVE
postings of one term (Lucene's own block shape — full utilization at any
df), chunked inside a shared RANGE_DOCS doc-id grid. Bounds compose per
BLOCK over doc-interval-overlapping blocks (r6):

  single term: per-block ub_t(b) prunes directly against theta.
  OR/AND: score(doc in block b of t) <= ub_t(b) + sum over s != t of
       (max ub_s among s-blocks overlapping b's doc interval) — the
       true BlockMaxWAND alignment (sparse-table range-max, driver
       arithmetic; see _composed_bounds).
  AND/phrase: candidate blocks via per-block (min_doc, max_doc)
       doc-interval intersection across terms — the skip-list Advance()
       analogue, vectorized in the driver.

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
     distinct docs are guaranteed to reach; theta = max_t g_t. Large
     prunable multi-term candidate sets additionally run a SEED job
     (_seed_theta) whose k-th ACHIEVED score is a far tighter theta,
     gated by an explicit cost model (_seed_pays).
  2. PRUNE: surviving block_ids = {b : composed bound >= theta*(1-eps)}
     — driver arithmetic, applied as a contiguous-run BETWEEN pushdown
     (IN-list / broadcast semi-join for dispersed sets); the returned
     LAZY plan explodes + scores only surviving blocks, fully inside
     whole-stage codegen (the columnar in-block arrays, not the varint
     bytes, feed the query path — no Python decode per query).

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

from collections import OrderedDict
from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.blocks import BLOCK_SIZE, RANGE_DOCS, pack_postings
from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.index.smallfloat import bm25_norm_cache
from lucenenet_spark.search.searcher import IndexSearcher, _f32

_EPS = 1e-6
# Pushdown-predicate representation thresholds.  Surviving block ids on any
# layout where pruning bites (impact-ordered, skewed) are contiguous RUNS,
# which compress into a handful of BETWEEN predicates — tiny to analyze and
# prunable against cached-batch min/max stats.  Dispersed id sets fall back
# to an IN-list only while small: a many-thousand-literal In expression
# costs SECONDS of Catalyst analysis per query (measured 5.4 s vs 0.9 s at
# a 6.6k-id list on the 1M probe), far more than the scan it saves.
_MAX_RANGES = 512
_MAX_INLIST = 2_048
# dispersed survivor sets ride as DATA, not plan literals: a driver-local
# (term, block_id) frame broadcast into a semi-join — O(1) plan size at any
# survivor count, bounded by driver memory for the local rows
_MAX_SEMIJOIN = 200_000


class BlockIndexSearcher:
    """Top-k serving over packed 128-doc blocks (mode='lucene' scoring —
    blocks carry the quantized norm byte, exactly what BM25 needs)."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame | None = None,
                 collect_stats: bool = False, meta_cache_max_rows: int = 2_000_000,
                 seed_min_blocks: int = 512, enable_nextword: bool = True,
                 nextword_firstwords: list[str] | None = None):
        """collect_stats matters only on the distributed fallback path,
        where pruning stats cost extra count() actions; the driver-metadata
        path fills last_stats for free. False (serving-latency mode) is the
        default. Single-term queries return ONE lazy pruned plan — the
        caller's action is the query's only Spark job.

        seed_min_blocks: multi-term OR/AND queries whose candidate set has
        at least this many blocks MAY run a SEED pass first (score the
        lead term's highest-upper-bound blocks + the other terms'
        overlapping blocks, collect the k-th ACHIEVED score; the final
        engage decision is the _seed_pays cost model) and prune with
        that theta — the distributed MaxScore/WAND discipline (Ding &
        Suel SIGIR'11; Turtle & Flood max-score), since per-term metadata
        alone cannot bound a SUM of contributions tightly (the k-th best
        single-term score is the only sound metadata theta, and with 3+
        terms ub_sum(range) ~ n_terms x any single-term bound, so nothing
        prunes). The seed pass is one extra small job; below the threshold
        the single-job metadata path is cheaper than any pruning it could
        buy. Results stay exactly identical: a pruned block's upper bound
        is strictly below an ACHIEVED k-th total score, so no top-k doc
        (ties included) can live there."""
        self.index = index
        self.inner = IndexSearcher(index, mode="lucene")
        self.seed_min_blocks = seed_min_blocks
        # lazily built per-field next-word pair tables (Williams, Zobel &
        # Bahle TOIS'04 combined index): (w1, w2, doc_id, pair_tf,
        # norm_byte), built once per searcher on the first two-word phrase
        # and persisted — the reader-open cost tier, like the block
        # metadata dict. nextword_firstwords restricts the build to hot
        # lead words (the TOIS'04 §4 partial tier — the production
        # configuration at web scale, where a full pair table is
        # corpus-token-sized); None builds the full table.
        self.enable_nextword = enable_nextword
        self.nextword_firstwords = nextword_firstwords
        self._nextword: dict[str, DataFrame] = {}
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
        # when the term's block count ALONE exceeds the cache bound. LRU:
        # accesses move entries to the end; when the bound is hit, least-
        # recently-used entries are evicted to make room (a long-lived
        # searcher serving a broad query stream no longer pins its first
        # meta_cache_max_rows of terms forever).
        self._meta: "OrderedDict[tuple[str, str], dict | None]" = OrderedDict()
        self._meta_rows = 0
        self._meta_entry_rows: dict[tuple[str, str], int] = {}
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

    def _meta_make_room(self, rows_needed: int, keep: set) -> bool:
        """Evict LRU entries (never this call's `keep` set) until
        rows_needed fits under meta_cache_max_rows. False if it can never
        fit (rows_needed alone exceeds the bound)."""
        if rows_needed > self.meta_cache_max_rows:
            return False
        for key in list(self._meta):
            if self._meta_rows + rows_needed <= self.meta_cache_max_rows:
                break
            if key in keep:
                continue
            self._meta_rows -= self._meta_entry_rows.pop(key, 0)
            del self._meta[key]
        return self._meta_rows + rows_needed <= self.meta_cache_max_rows

    def _load_meta(self, fld: str, terms: list[str]) -> dict[str, dict | None]:
        """Driver-side block metadata per term (skip-list analogue).
        Returns {term: {bid, nd, mtf, mnb} | None}; None = too many blocks
        to cache (use the distributed path)."""
        keep = {(fld, t) for t in terms}
        missing = [t for t in terms if (fld, t) not in self._meta]
        if missing:
            # Guard the collect itself: a stopword-scale term has ~df/128
            # blocks, and collecting those rows just to discover they exceed
            # the cache bound would OOM the driver. df is already driver-
            # resident (or an O(|terms|) pushdown lookup), so estimate first
            # and mark over-budget terms None WITHOUT collecting their rows.
            # df // BLOCK_SIZE is a lower bound on the true block count
            # (range boundaries can split blocks), so the exact post-collect
            # check below still applies to the terms we do fetch.
            stats = self.inner._term_stats([(fld, t) for t in missing])
            for t in list(missing):
                est = max(1, stats.get((fld, t), (0, 0))[0] // BLOCK_SIZE)
                if not self._meta_make_room(est, keep):
                    self._meta[(fld, t)] = None
                    self._meta_entry_rows[(fld, t)] = 0
                    missing.remove(t)
        if missing:
            rows = (
                self.blocks.filter(
                    (F.col("field") == fld) & (F.col("term").isin(missing))
                )
                .select("term", "block_id", "min_doc", "max_doc", "n_docs",
                        "max_tf", "max_norm_byte", "imp_tf", "imp_nb", "imp_cnt")
                .collect()
            )
            by_term: dict[str, list] = {t: [] for t in missing}
            for r in rows:
                by_term[r["term"]].append(
                    (r["block_id"], r["min_doc"], r["max_doc"], r["n_docs"],
                     r["max_tf"], r["max_norm_byte"],
                     r["imp_tf"], r["imp_nb"], r["imp_cnt"])
                )
            for t, lst in by_term.items():
                if not self._meta_make_room(len(lst), keep):
                    self._meta[(fld, t)] = None
                    self._meta_entry_rows[(fld, t)] = 0
                    continue
                lst.sort(key=lambda x: x[0])
                arr = np.array([x[:6] for x in lst], dtype=np.int64).reshape(-1, 6)
                # flattened impact multiset (block association not needed:
                # the threshold only consumes the term-wide distribution)
                self._meta[(fld, t)] = {
                    "bid": arr[:, 0], "mind": arr[:, 1], "maxd": arr[:, 2],
                    "nd": arr[:, 3], "mtf": arr[:, 4], "mnb": arr[:, 5],
                    "rng": arr[:, 1] // RANGE_DOCS,
                    "itf": np.array([v for x in lst for v in x[6]], dtype=np.int64),
                    "inb": np.array([v for x in lst for v in x[7]], dtype=np.int64),
                    "icnt": np.array([v for x in lst for v in x[8]], dtype=np.int64),
                }
                self._meta_rows += len(lst)
                self._meta_entry_rows[(fld, t)] = len(lst)
        # LRU touch on every hit
        for t in terms:
            self._meta.move_to_end((fld, t))
        return {t: self._meta[(fld, t)] for t in terms}

    def _block_ubs(self, meta: dict[str, dict], weights: dict[str, float],
                   fld: str) -> dict[str, np.ndarray]:
        """Per-term per-block upper bounds, block order.
        ub_t(b) = w_t * max_tf / (max_tf + cache[max_norm_byte]) — cache is
        DECREASING in norm_byte, so max_norm_byte gives the smallest norm."""
        cache = self._cache_np(fld).astype(np.float64)
        out = {}
        for t, m in meta.items():
            mt = m["mtf"].astype(np.float64)
            out[t] = weights[t] * mt / (mt + cache[m["mnb"]])
        return out

    @staticmethod
    def _overlaps_any(mind_b: np.ndarray, maxd_b: np.ndarray,
                      mind_s: np.ndarray, maxd_s: np.ndarray) -> np.ndarray:
        """For each block b (doc interval [mind_b, maxd_b]), does ANY block
        of the other term overlap it?  Blocks of one term are doc-sorted
        and non-overlapping, so one searchsorted answers it — the
        skip-list Advance() analogue as vectorized driver arithmetic."""
        if len(mind_s) == 0:
            return np.zeros(len(mind_b), dtype=bool)
        i = np.searchsorted(maxd_s, mind_b, side="left")
        ok = i < len(mind_s)
        res = np.zeros(len(mind_b), dtype=bool)
        res[ok] = mind_s[np.minimum(i[ok], len(mind_s) - 1)] <= maxd_b[ok]
        return res

    def _interval_intersect(self, meta: dict[str, dict]) -> dict[str, np.ndarray]:
        """Per term: mask of blocks whose doc interval overlaps at least
        one block of EVERY other term (conjunction candidate set)."""
        out = {}
        for t, m in meta.items():
            mask = np.ones(len(m["bid"]), dtype=bool)
            for s, ms in meta.items():
                if s == t:
                    continue
                mask &= self._overlaps_any(m["mind"], m["maxd"], ms["mind"], ms["maxd"])
            out[t] = mask
        return out

    @staticmethod
    def _explode_cols(surv: DataFrame, with_positions: bool = False) -> DataFrame:
        """Columnar block -> per-posting rows, entirely inside whole-stage
        codegen (arrays_zip + explode of the int arrays; no Python)."""
        cols = ["doc_offs", "tfs", "nbs"] + (["poss"] if with_positions else [])
        ex = surv.select(
            "term", "min_doc", F.explode(F.arrays_zip(*cols)).alias("e")
        )
        out = ex.select(
            "term",
            (F.col("min_doc") + F.col("e.doc_offs")).cast("long").alias("doc_id"),
            F.col("e.tfs").alias("tf"),
            F.col("e.nbs").alias("norm_byte"),
            *([F.col("e.poss").alias("positions")] if with_positions else []),
        )
        return out

    @staticmethod
    def _keyset(after: tuple[float, int] | None):
        """SearchAfter keyset predicate on the scored rows
        (TopScoreDocCollector.cs:112-114 tie-break); None = first page."""
        if after is None:
            return None
        a_score, a_doc = float(after[0]), int(after[1])
        return (F.col("score") < F.lit(a_score)) | (
            (F.col("score") == F.lit(a_score)) & (F.col("doc_id") > F.lit(a_doc))
        )

    def _meta_theta(self, meta: dict[str, dict], weights: dict[str, float],
                    fld: str, k: int, max_score: float | None = None) -> float | None:
        """Guaranteed k-th-best-score threshold from the impact lists
        alone.  Per term t, the flattened impact multiset {(score, count)}
        is the term's EXACT per-doc score distribution (up to pairs beyond
        IMPACT_CAP, whose omission only weakens, never unsafes, the
        bound): sorting scores descending and accumulating counts to k
        gives g_t = a score >= the k-th best single-term contribution of
        >= k DISTINCT docs.  theta = max_t g_t — any doc's OR sum is >=
        its single-term contribution, so at least k docs score >= theta.

        max_score (SearchAfter pages, SINGLE-term only): truncate the
        distribution to scores STRICTLY below the previous page's last
        score before accumulating — the remaining multiset is exactly the
        eligible docs minus same-score ties, so g_t underestimates (never
        overestimates) the page's true k-th score: a safe theta.  Tie docs
        themselves score == after.score > theta, so their blocks survive
        the prune.  (For multi-term OR the filter applies to the SUM, not
        the per-term contribution, so no sound truncation exists — callers
        pass max_score only when len(meta) == 1.)"""
        cache = self._cache_np(fld).astype(np.float64)
        theta = None
        for t, m in meta.items():
            if len(m["itf"]) == 0:
                continue
            s = weights[t] * m["itf"] / (m["itf"] + cache[m["inb"]])
            cnt = m["icnt"]
            if max_score is not None:
                keep = s < max_score
                s, cnt = s[keep], cnt[keep]
                if len(s) == 0:
                    continue
            order = np.argsort(-s, kind="stable")
            covered = np.cumsum(cnt[order])
            hit = np.searchsorted(covered, k)
            if hit >= len(order):
                continue
            g = float(s[order[hit]])
            if theta is None or g > theta:
                theta = g
        return theta

    @staticmethod
    def _id_runs(bids: np.ndarray) -> list[tuple[int, int]]:
        """Sorted ids -> maximal contiguous [lo, hi] runs."""
        ids = np.sort(np.asarray(bids, dtype=np.int64))
        if len(ids) == 0:
            return []
        starts = np.r_[0, np.flatnonzero(np.diff(ids) != 1) + 1]
        ends = np.r_[starts[1:], len(ids)]
        return [(int(ids[s]), int(ids[e - 1])) for s, e in zip(starts, ends)]

    def _semi_join_pushdown(self, surviving: dict[str, np.ndarray]):
        """Driver-local (term, block_id) survivor frame for a broadcast
        semi-join, or None when it exceeds _MAX_SEMIJOIN rows.  Used when
        the survivor set is too dispersed for run-BETWEENs and too large
        for an IN-list (a many-thousand-literal In costs seconds of
        Catalyst analysis; a 6.6k-row LocalRelation costs nothing)."""
        n_ids = sum(len(v) for v in surviving.values())
        if n_ids == 0 or n_ids > _MAX_SEMIJOIN:
            return None
        spark = self.blocks.sparkSession
        rows = [(t, int(b)) for t, bids in surviving.items() for b in bids]
        return spark.createDataFrame(rows, "term string, block_id long")

    @classmethod
    def _blocks_pred(cls, surviving: dict[str, np.ndarray]):
        """Per-term block predicate, or None when no compact representation
        exists (see _MAX_RANGES/_MAX_INLIST).  Runs-of-BETWEEN preferred:
        identical set semantics, O(runs) plan size, and cached-batch
        min/max stats can prune on a range where they cannot on a set."""
        per_term = {t: cls._id_runs(bids) for t, bids in surviving.items()}
        n_runs = sum(len(r) for r in per_term.values())
        n_ids = sum(len(v) for v in surviving.values())
        tpred = None
        if n_runs <= _MAX_RANGES:
            for t, runs in per_term.items():
                rp = None
                for lo, hi in runs:
                    c = (
                        (F.col("block_id") == lo)
                        if lo == hi
                        else F.col("block_id").between(lo, hi)
                    )
                    rp = c if rp is None else (rp | c)
                if rp is not None:
                    c = (F.col("term") == t) & rp
                    tpred = c if tpred is None else (tpred | c)
        elif n_ids <= _MAX_INLIST:
            for t, bids in surviving.items():
                c = (F.col("term") == t) & F.col("block_id").isin(
                    [int(b) for b in bids]
                )
                tpred = c if tpred is None else (tpred | c)
        return tpred

    def _scan_plan(self, terms: list[str], weights: dict[str, float], fld: str,
                   surviving: dict[str, np.ndarray] | None, k: int, mode: str,
                   n_terms: int, after: tuple[float, int] | None = None) -> DataFrame:
        """The returned (lazy) plan: pushdown-filter surviving blocks
        (per-term contiguous-run BETWEENs, IN-list fallback — block ids
        are per-term ordinals), decode, score, top-k. No joins, no extra
        actions."""
        pred = (F.col("field") == fld) & F.col("term").isin(terms)
        src = self.blocks
        applied = False
        if surviving is not None:
            tpred = self._blocks_pred(surviving)
            if tpred is not None:
                pred = pred & tpred
                applied = True
            else:
                surv_df = self._semi_join_pushdown(surviving)
                if surv_df is not None:
                    src = src.filter(pred).join(
                        F.broadcast(surv_df), ["term", "block_id"], "left_semi"
                    )
                    pred = None
                    applied = True
        if surviving is not None and not applied:
            # pushdown skipped (survivor set too large even for the
            # semi-join): every candidate block is scanned, so report that
            # honestly — pruning stats are bench evidence and must not
            # overstate pruning in this regime.
            self.last_stats["blocks_scored"] = self.last_stats.get(
                "blocks_total", self.last_stats.get("blocks_scored")
            )
            self.last_stats["inlist_applied"] = False
        decoded = self._explode_cols(src.filter(pred) if pred is not None else src)
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
        ks = self._keyset(after)
        if ks is not None:
            out = out.filter(ks)
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _empty(self) -> DataFrame:
        return self.inner._empty_scored()

    def _per_term_guarantee(self, meta: dict[str, dict],
                            weights: dict[str, float], fld: str,
                            k: int) -> dict[str, float]:
        """{term: g_t} where g_t = a score that >= k distinct docs are
        guaranteed to reach from term t alone (see _meta_theta)."""
        cache = self._cache_np(fld).astype(np.float64)
        out: dict[str, float] = {}
        for t, m in meta.items():
            if len(m["itf"]) == 0:
                continue
            s = weights[t] * m["itf"] / (m["itf"] + cache[m["inb"]])
            order = np.argsort(-s, kind="stable")
            covered = np.cumsum(m["icnt"][order])
            hit = np.searchsorted(covered, k)
            if hit < len(order):
                out[t] = float(s[order[hit]])
        return out

    def _seed_theta(self, meta: dict[str, dict], ubs: dict[str, np.ndarray],
                    terms: list[str], weights: dict[str, float], fld: str,
                    k: int, mode: str, n_terms: int,
                    after: tuple[float, int] | None,
                    masks: dict[str, np.ndarray] | None = None,
                    ) -> tuple[float | None, int]:
        """Seed pass (distributed MaxScore/WAND discipline): score a SMALL
        block subset likely to contain the winners — the LEAD term's
        top-upper-bound blocks plus, for every other query term, the
        blocks whose doc intervals overlap them (a doc appears in exactly
        one block per term, so the overlapping set makes those docs'
        totals EXACT) — then take the k-th achieved score as theta.

        Soundness needs no completeness: a doc's score over ANY block
        subset only omits contributions, so every achieved score is a
        lower bound on that doc's true total; k rows >= theta therefore
        guarantee k true scores >= theta.  For AND the nt >= n_terms
        filter only passes docs whose every term-block was scanned, so
        emitted AND scores are exact.  SearchAfter pages stay sound: the
        keyset filter applies to the seed scoring too, so theta is the
        k-th ACHIEVED score among page-eligible docs."""
        # lead = the term whose guaranteed k-th single-term score is
        # highest (the metadata theta's own term); fallback: biggest ub
        g = self._per_term_guarantee(meta, weights, fld, k)
        if mode == "and":
            live = {t for t, mk in (masks or {}).items() if mk.any()}
            g = {t: v for t, v in g.items() if t in live}
        if g:
            lead = max(g, key=g.get)
        else:
            lead = max(meta, key=lambda t: float(ubs[t].max()) if len(ubs[t]) else -1.0)
        m_lead = meta[lead]
        cand = np.arange(len(m_lead["bid"]))
        if mode == "and" and masks is not None:
            cand = cand[masks[lead][cand]]
        if len(cand) == 0:
            return None, 0
        order = cand[np.argsort(-ubs[lead][cand], kind="stable")]
        # lead coverage: enough blocks for k docs, deepened to ~1/16 of
        # the lead's candidate blocks (capped at 256) — on tf-dispersed
        # corpora the true top-k sit beyond the first couple of blocks,
        # and a few percent of blocks seeded buys a theta within ~1% of
        # the oracle's (measured: 2/8/32/92-block lead seeds achieved
        # 0/5/24/~37% of blocks pruned vs ~50% for the oracle theta on an
        # impact-ordered iid corpus; skewed corpora saturate at 2 blocks)
        covered, n_cov = 0, 0
        for i in order:
            n_cov += 1
            covered += int(m_lead["nd"][i])
            if covered >= k and n_cov >= 2:
                break
        n_lead = min(len(order), max(n_cov, min(256, len(order) // 16)))
        lead_idx = order[:n_lead]
        seed_blocks: dict[str, np.ndarray] = {lead: m_lead["bid"][lead_idx]}
        lo = m_lead["mind"][lead_idx]
        hi = m_lead["maxd"][lead_idx]
        for s, ms in meta.items():
            if s == lead:
                continue
            # blocks of s overlapping any lead interval: doc-sorted,
            # disjoint blocks make each interval a contiguous run
            i0 = np.searchsorted(ms["maxd"], lo, side="left")
            i1 = np.searchsorted(ms["mind"], hi, side="right")
            take = np.zeros(len(ms["bid"]), dtype=bool)
            for a, b in zip(i0, i1):
                if a < b:
                    take[a:b] = True
            if take.any():
                seed_blocks[s] = ms["bid"][take]
        n_blocks = sum(len(b) for b in seed_blocks.values())
        total = sum(len(m["bid"]) for m in meta.values())
        if n_blocks >= total:
            return None, 0  # seeding everything = the unpruned scan
        rows = self._scan_plan(
            list(seed_blocks), weights, fld, seed_blocks, k, mode, n_terms, after
        ).collect()
        if len(rows) < k:
            return None, n_blocks
        return float(rows[-1]["score"]), n_blocks

    def _driver_two_phase(self, meta: dict[str, dict], terms: list[str],
                          weights: dict[str, float], fld: str, k: int,
                          mode: str, n_terms: int,
                          after: tuple[float, int] | None = None) -> DataFrame:
        """Driver-arithmetic WAND: theta + ub pruning, then ONE lazy plan
        over the surviving blocks.

        Single-term queries prune at BLOCK granularity (ub_t(b) < theta)
        with a metadata-only theta — zero pre-actions, serving cost is
        exactly the caller's single job.  Multi-term queries compose
        per-block bounds over doc-interval-overlapping blocks
        (_composed_bounds); when the seed cost model clears
        (_seed_pays) they first run the SEED pass
        (_seed_theta) whose ACHIEVED k-th score is a far tighter theta
        than any per-term metadata bound — this is what makes a
        stopword-class OR prune at scale.  AND additionally intersects
        block doc-intervals (the skip-list Advance analogue)."""
        ubs = self._block_ubs(meta, weights, fld)
        total = sum(len(m["bid"]) for m in meta.values())
        if total == 0:
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        theta = None
        if mode != "and":
            # metadata theta: sound for first pages (k-th best single-term
            # contribution); SearchAfter truncation is single-term only.
            if after is None:
                theta = self._meta_theta(meta, weights, fld, k)
            elif n_terms == 1:
                theta = self._meta_theta(
                    meta, weights, fld, k, max_score=float(after[0])
                )

        if n_terms == 1 and mode != "and":
            t = next(iter(meta))
            m = meta[t]
            if theta is None:
                surviving = {t: m["bid"]}
            else:
                surviving = {t: m["bid"][ubs[t] >= theta * (1.0 - _EPS)]}
            scored = sum(len(v) for v in surviving.values())
            self.last_stats = {"blocks_total": total, "blocks_scored": scored}
            use = None if scored == total else surviving
            return self._scan_plan(terms, weights, fld, use, k, mode, n_terms, after)

        # ---- multi-term: interval-composed bounds + optional seed pass ----
        masks = None
        if mode == "and":
            # conjunction candidate set: per-block doc-interval
            # intersection across terms (the skip-list Advance analogue)
            masks = self._interval_intersect(meta)
            if any(not masks[t].any() for t in meta):
                self.last_stats = {"blocks_total": total, "blocks_scored": 0}
                return self._empty()
        bounds = self._composed_bounds(meta, ubs)
        seed_blocks = 0
        theta_est = sum(self._per_term_guarantee(meta, weights, fld, k).values())
        if self._seed_pays(meta, bounds, theta_est, total):
            achieved, seed_blocks = self._seed_theta(
                meta, ubs, terms, weights, fld, k, mode, n_terms, after, masks
            )
            if achieved is not None and (theta is None or achieved > theta):
                theta = achieved

        if theta is None:
            if masks is not None:
                surviving = {t: m["bid"][masks[t]] for t, m in meta.items()}
            else:
                surviving = {t: m["bid"] for t, m in meta.items()}
        else:
            surviving = self._prune_by_bound(meta, bounds, theta, masks)
        if all(len(v) == 0 for v in surviving.values()):
            self.last_stats = {"blocks_total": total, "blocks_scored": 0,
                               **({"seed_blocks": seed_blocks} if seed_blocks else {})}
            return self._empty()
        scored = sum(len(v) for v in surviving.values())
        self.last_stats = {"blocks_total": total, "blocks_scored": scored}
        if seed_blocks:
            self.last_stats["seed_blocks"] = seed_blocks
        use = None if scored == total else surviving
        return self._scan_plan(terms, weights, fld, use, k, mode, n_terms, after)

    @staticmethod
    def _sparse_max_table(a: np.ndarray) -> list[np.ndarray]:
        """Sparse table for O(1) range-max queries over `a`."""
        tables = [a]
        j = 1
        while (1 << j) <= len(a):
            prev = tables[-1]
            half = 1 << (j - 1)
            tables.append(np.maximum(prev[: len(a) - (1 << j) + 1],
                                     prev[half: len(a) - half + 1]))
            j += 1
        return tables

    @staticmethod
    def _window_max(tables: list[np.ndarray], i0: np.ndarray,
                    i1: np.ndarray) -> np.ndarray:
        """max(a[i0:i1]) per row, 0.0 where the window is empty."""
        out = np.zeros(len(i0), dtype=np.float64)
        w = i1 - i0
        nz = w > 0
        if not nz.any():
            return out
        lev = np.zeros(len(i0), dtype=np.int64)
        lev[nz] = np.floor(np.log2(w[nz])).astype(np.int64)
        for j in range(int(lev.max()) + 1 if nz.any() else 0):
            sel = nz & (lev == j)
            if not sel.any():
                continue
            T = tables[j]
            left = i0[sel]
            right = i1[sel] - (1 << j)
            out[sel] = np.maximum(T[left], T[right])
        return out

    def _composed_bounds(self, meta: dict[str, dict],
                         ubs: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Block-interval composed bound (the BlockMaxWAND alignment of
        Ding & Suel SIGIR'11 §5): a doc in block b of term t lies, for
        every other term s, inside at most one s-block whose doc interval
        OVERLAPS b's — so score(doc in b) <= ub_t(b) + sum over s != t of
        max ub_s among s-blocks overlapping [min_doc(b), max_doc(b)].
        Blocks of one term are doc-sorted and disjoint, so each overlap
        set is one contiguous run (two searchsorted) and the max is an
        O(1) sparse-table query — O(B log B) driver arithmetic total,
        far tighter than any fixed coarse grid."""
        tables = {s: self._sparse_max_table(ubs[s]) for s in meta}
        bounds = {}
        for t, m in meta.items():
            bound = ubs[t].copy()
            for s, ms in meta.items():
                if s == t:
                    continue
                i0 = np.searchsorted(ms["maxd"], m["mind"], side="left")
                i1 = np.searchsorted(ms["mind"], m["maxd"], side="right")
                bound += self._window_max(tables[s], i0, i1)
            bounds[t] = bound
        return bounds

    # Seed cost model (affects only WHEN the seed job runs, never
    # correctness).  Pruning power depends on where the achieved theta
    # LANDS inside the composed-bound distribution, not on the bounds'
    # spread; the driver-side estimate of the achievable theta is
    # theta_est = sum over terms of g_t (each term's guaranteed k-th
    # single-term score from its impact lists) — the total the top docs
    # reach when the query terms co-occur.  The seed pass is then worth
    # one extra Spark job iff its estimated saving, in block-scan
    # equivalents, beats its cost:
    #
    #   frac(bounds < theta_est) x total x DISCOUNT
    #       >= seed_block_estimate + seed_overhead_blocks
    #
    # DISCOUNT=0.5 deflates the optimistic co-occurrence estimate
    # (measured realization ~0.4-1.0 of the estimate across layouts);
    # seed_overhead_blocks expresses the WHOLE seed pass's fixed cost in
    # block-scan equivalents.  Calibrated from an interleaved same-window
    # A/B at 1M docs / 16 cores (impact-ordered layout, 22.9k candidate
    # blocks): the seeded path pruned 71% of blocks yet ran ~1.0 s
    # SLOWER per query than the plain scan (seed job scan+score+shuffle+
    # collect, driver bound arithmetic, survivor-pushdown build), i.e.
    # ~23k block-equivalents at that scan rate — hence the 24k default:
    # the seed engages only where the avoided scan clearly dominates an
    # extra job (>= several-M-doc candidate sets, or deeply skewed
    # corpora at >= ~50k blocks where frac_est ~ 1).  Other measured
    # calibration points: uniform sf1.0 3-term OR has theta_est BELOW
    # every composed bound (the true theta prunes 0 of 910 —
    # co-occurrence never reaches the per-block maxima) -> skip; an
    # impact-ordered 200k-doc corpus estimates 98% but realizes 39% over
    # only 4.6k blocks -> skip (a seeded run measured 2.2 s vs 0.36 s).
    seed_discount = 0.5
    seed_overhead_blocks = 24_576

    def _seed_pays(self, meta: dict[str, dict], bounds: dict[str, np.ndarray],
                   theta_est: float, total: int) -> bool:
        if total < self.seed_min_blocks or theta_est <= 0.0 or not bounds:
            return False
        allb = np.concatenate(list(bounds.values()))
        if len(allb) == 0:
            return False
        frac_est = float((allb < theta_est * (1.0 - _EPS)).mean())
        lead_len = max(len(m["bid"]) for m in meta.values())
        seed_est = len(meta) * min(256, max(2, lead_len // 16))
        return (
            frac_est * total * self.seed_discount
            >= seed_est + self.seed_overhead_blocks
        )

    def _prune_by_bound(self, meta: dict[str, dict],
                        bounds: dict[str, np.ndarray], theta: float,
                        masks: dict[str, np.ndarray] | None) -> dict[str, np.ndarray]:
        """Threshold the composed bounds: blocks whose bound is below
        theta cannot hold any top-k doc (ties included).  `masks` (AND)
        pre-restricts to the interval-intersection candidate set; using
        every overlapping s-block for the maxima only weakens — never
        unsafes — the bound."""
        surviving = {}
        for t, m in meta.items():
            keep = bounds[t] >= theta * (1.0 - _EPS)
            if masks is not None:
                keep &= masks[t]
            surviving[t] = m["bid"][keep]
        return surviving

    # ---------------------------------------------- distributed fallback
    def _metas(self, terms: list[str], weights: dict[str, float], fld: str) -> DataFrame:
        """Per-(term, block) metadata rows with the term's block upper
        bound — the fallback path when the metadata dict would not fit."""
        cache = self.inner._cache_col_for(fld)
        wmap = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(float(w)))])
        cmin = F.element_at(cache, F.col("max_norm_byte") + F.lit(1))
        mt = F.col("max_tf").cast("double")
        ub = (wmap[F.col("term")] * mt / (mt + cmin.cast("double"))).alias("ub")
        rng = (F.col("min_doc") / F.lit(RANGE_DOCS)).cast("long").alias("rng")
        return self.blocks.filter(
            (F.col("field") == fld) & (F.col("term").isin(terms))
        ).select("field", "term", "block_id", "min_doc", "n_docs",
                 "doc_offs", "tfs", "nbs", ub, rng)

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
                   k: int, mode: str, n_terms: int,
                   after: tuple[float, int] | None = None) -> DataFrame:
        """Distributed seed -> theta -> prune on the RANGE grid (fallback
        for terms whose block metadata exceeds the driver cache bound).

        SearchAfter pages stay sound here: the keyset filter is applied to
        the SEED scoring too, so theta is the k-th ACHIEVED score among
        page-eligible docs — blocks pruned by ub_sum < theta cannot hold
        any doc scoring >= theta, eligible or not."""
        ks = self._keyset(after)
        per_tr = metas.groupBy("term", "rng").agg(
            F.max("ub").alias("ub"), F.sum("n_docs").alias("nd")
        )
        by_range = per_tr.groupBy("rng").agg(
            F.sum("ub").alias("ub_sum"),
            F.max("nd").alias("nd"),
            F.count(F.lit(1)).alias("terms_present"),
        )
        if mode == "and":
            by_range = by_range.filter(F.col("terms_present") >= n_terms)
        total = by_range.count() if self.collect_stats else None

        seed_rows = (
            by_range.select("rng", "nd", "ub_sum")
            .orderBy(F.desc("ub_sum"), F.asc("rng"))
            .limit(max(k, 4))
            .collect()
        )
        if not seed_rows:
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        covered, seed_ids = 0, []
        for r in seed_rows:
            seed_ids.append(r["rng"])
            covered += r["nd"]
            if covered >= k and len(seed_ids) >= 4:
                break
        seed_metas = metas.filter(F.col("rng").isin(seed_ids))
        seed_scored = self._score_decoded(seed_metas, weights, fld, mode, n_terms)
        if ks is not None:
            seed_scored = seed_scored.filter(ks)
        seed_topk = (
            seed_scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        if len(seed_topk) < k:
            self.last_stats = {"blocks_total": total, "blocks_scored": total}
            out = self._score_decoded(metas, weights, fld, mode, n_terms)
            if ks is not None:
                out = out.filter(ks)
            return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        theta = float(seed_topk[-1]["score"])

        surviving_ids = by_range.filter(
            F.col("ub_sum") >= F.lit(theta * (1.0 - _EPS))
        ).select("rng")
        survivors = metas.join(surviving_ids, "rng")
        n_scored = surviving_ids.count() if self.collect_stats else None
        self.last_stats = {"blocks_total": total, "blocks_scored": n_scored}
        out = self._score_decoded(survivors, weights, fld, mode, n_terms)
        if ks is not None:
            out = out.filter(ks)
        return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # ------------------------------------------------------------- public
    def topk_term(self, term: str, k: int = 10, boost: float = 1.0,
                  field: str | None = None,
                  after: tuple[float, int] | None = None) -> DataFrame:
        return self.topk_or({term: boost}, k, field, after=after)

    def topk_or(self, term_boosts: dict[str, float], k: int = 10,
                field: str | None = None,
                after: tuple[float, int] | None = None) -> DataFrame:
        """Multi-term disjunction with aligned block-max WAND pruning
        (DisjunctionSumScorer semantics, scores rank-identical to
        IndexSearcher's OR).  `after` = (score, doc_id) of the previous
        page's last hit (IndexSearcher.SearchAfter): the keyset predicate
        is pushed into the pruned single-job plan; single-term pages keep
        a sound truncated-impact theta."""
        return self._topk(list(term_boosts), dict(term_boosts), k, field, "or",
                          after=after)

    def topk_and(self, terms: list[str], k: int = 10,
                 field: str | None = None,
                 after: tuple[float, int] | None = None) -> DataFrame:
        """Conjunction: block-range intersection (every term present in
        the block — the skip-list Advance analogue) + summed-ub pruning
        (ConjunctionScorer semantics)."""
        return self._topk(list(terms), {t: 1.0 for t in terms}, k, field, "and",
                          after=after)

    def _topk(self, terms: list[str], boosts: dict[str, float], k: int,
              field: str | None, mode: str,
              after: tuple[float, int] | None = None) -> DataFrame:
        fld = field or self.index.default_field
        weights = self._weights(boosts, fld)
        n_terms = len(terms)
        meta = self._load_meta(fld, terms)
        live = {t: m for t, m in meta.items() if m is not None and len(m["bid"])}
        if any(m is None for m in meta.values()):
            metas = self._metas(terms, weights, fld)
            return self._two_phase(metas, weights, fld, k, mode, n_terms, after)
        if not live or (mode == "and" and len(live) < n_terms):
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        return self._driver_two_phase(live, list(live), weights, fld, k, mode,
                                      n_terms, after)

    def _nextword_table(self, fld: str) -> DataFrame:
        """(w1, w2, doc_id, pair_tf, norm_byte) adjacency table derived
        from the positional postings (holes from stop-word removal behave
        identically to the positional intersect: no adjacency across a
        hole). Built once per searcher per field and persisted — the same
        reader-open tier as the block metadata dict."""
        if fld not in self._nextword:
            p = self.index.postings.filter(F.col("field") == fld).select(
                "doc_id", "term", "positions", "norm_byte"
            )
            lead = p
            if self.nextword_firstwords is not None:
                lead = p.filter(F.col("term").isin(list(self.nextword_firstwords)))
            a = lead.select(
                "doc_id", F.col("term").alias("w1"),
                F.explode("positions").alias("pos"), "norm_byte",
            )
            b = p.select(
                "doc_id", F.col("term").alias("w2"),
                F.explode("positions").alias("pos2"),
            ).select("doc_id", "w2", (F.col("pos2") - F.lit(1)).alias("pos"))
            pairs = (
                a.join(b, ["doc_id", "pos"])
                .groupBy("w1", "w2", "doc_id")
                .agg(
                    F.count(F.lit(1)).cast("int").alias("pair_tf"),
                    F.first("norm_byte").alias("norm_byte"),
                )
            )
            n = max(
                1, self.index.postings.sparkSession.sparkContext.defaultParallelism
            )
            self._nextword[fld] = (
                pairs.repartition(n, "w1", "w2")
                .sortWithinPartitions("w1", "w2")
                .persist()
            )
        return self._nextword[fld]

    def topk_phrase(self, terms: tuple[str, ...], k: int = 10,
                    field: str | None = None) -> DataFrame:
        """Exact phrase over packed blocks.

        Two-word phrases are served from the NEXT-WORD pair table
        (Williams, Zobel & Bahle TOIS'04: phrase freq == adjacency count,
        so the query is a single (w1, w2) lookup scored with the same
        summed-idf BM25 kernel — rank- and score-identical to the
        positional path, twin-tested).  Longer phrases: candidate blocks =
        block_ids where ALL phrase terms are present (block doc-interval
        intersection, computed from the driver metadata dict — zero extra
        actions); decode positions only for those; then the usual
        shifted-positions intersect (ExactPhraseScorer.cs) scored with
        summed idf."""
        fld = field or self.index.default_field
        stats = self.inner._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        idf_sum = np.float32(0.0)
        for t in terms:
            idf_sum = _f32(idf_sum + _f32(self.inner._idf(stats[(fld, t)][0])))
        wv = self.inner._weight_value(float(idf_sum), 1.0, 1.0)

        if (
            self.enable_nextword
            and len(terms) == 2
            and (
                self.nextword_firstwords is None
                or terms[0] in self.nextword_firstwords
            )
        ):
            meta = self._load_meta(fld, sorted(set(terms)))
            total = sum(len(m["bid"]) for m in meta.values() if m is not None)
            nw = self._nextword_table(fld)
            hits = nw.filter(
                (F.col("w1") == terms[0]) & (F.col("w2") == terms[1])
            )
            scored = hits.select(
                "doc_id",
                self.inner._score_col(wv, F.col("pair_tf"), fld).alias("score"),
            )
            # zero blocks touched: the pair table IS the posting list here
            self.last_stats = {
                "blocks_total": total, "blocks_scored": 0, "nextword": True,
            }
            return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

        uniq = sorted(set(terms))
        meta = self._load_meta(fld, uniq)
        pred = (F.col("field") == fld) & F.col("term").isin(list(terms))
        cols = ["field", "term", "min_doc", "doc_offs", "tfs", "nbs", "poss"]
        if all(m is not None for m in meta.values()):
            # candidate blocks = per-block doc-interval intersection
            # across the phrase's terms (skip-list Advance analogue) —
            # driver arithmetic, no actions
            total = sum(len(m["bid"]) for m in meta.values())
            masks = self._interval_intersect(meta)
            if any(not masks[t].any() for t in meta):
                self.last_stats = {"blocks_total": total, "blocks_scored": 0}
                return self._empty()
            surviving = {t: m["bid"][masks[t]] for t, m in meta.items()}
            scored = sum(len(v) for v in surviving.values())
            self.last_stats = {"blocks_total": total, "blocks_scored": scored}
            if scored < total:
                tpred = self._blocks_pred(surviving)
                if tpred is not None:
                    pred = pred & tpred
                else:
                    self.last_stats["blocks_scored"] = total
            survivors = self.blocks.filter(pred).select(*cols)
        else:
            # fallback: distributed candidate-range intersection
            rng = (F.col("min_doc") / F.lit(RANGE_DOCS)).cast("long").alias("rng")
            metas = self.blocks.filter(pred).select(*cols, rng)
            cand = (
                metas.select("term", "rng").distinct()
                .groupBy("rng")
                .agg(F.count(F.lit(1)).alias("tp"))
                .filter(F.col("tp") >= len(set(terms)))
                .select("rng")
            )
            if self.collect_stats:
                self.last_stats = {
                    "blocks_total": metas.count(),
                    "blocks_scored": metas.join(cand, "rng").count(),
                }
            else:
                self.last_stats = {}
            survivors = metas.join(cand, "rng")
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
