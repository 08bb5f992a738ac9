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
n_docs, max_tf, max_norm_byte) per (field, term) — lives in a driver-side
dictionary, exactly as the reference keeps the FST term index and skip
data memory-resident per open SegmentReader (BlockTreeTermsReader /
Lucene41SkipReader). Seed selection, the WAND threshold, and the pruning
decision are then pure driver arithmetic:

  1. SEED: pick the highest-ub_sum blocks covering >= k docs; fetch ONLY
     their packed bytes (pushdown filter on the cached blocks table — no
     shuffle) and score them in numpy with the same float32 ops the
     distributed scorer uses -> theta = k-th best score.
  2. PRUNE: surviving block_ids = {b : ub_sum(b) >= theta*(1-eps)} —
     computed in the driver, applied as an IN-list pushdown filter; the
     returned plan decodes + scores only surviving blocks.

Cost per query: ONE small collect (seed packed bytes) + the caller's
action on the returned top-k plan. Pruning stats are free (driver
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

from lucenenet_spark.index.blocks import pack_postings, unpack_block_bytes, unpack_blocks
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
                 collect_stats: bool = False, meta_cache_max_rows: int = 2_000_000,
                 max_driver_docs: int = 100_000):
        """collect_stats matters only on the distributed fallback path,
        where pruning stats cost extra count() actions; the driver-metadata
        path fills last_stats for free. False (serving-latency mode) is the
        default.

        max_driver_docs: when the WAND-surviving blocks hold at most this
        many postings, the final top-k is finished driver-side from the
        fetched packed bytes (total transfer <= ~3 bytes/posting) instead
        of scheduling a cluster job — the Lucene serving model, where a
        query reads only its surviving blocks. Larger survivor sets run
        the distributed scan plan."""
        self.index = index
        self.blocks = blocks if blocks is not None else pack_postings(index.postings)
        self.inner = IndexSearcher(index, mode="lucene")
        self.collect_stats = collect_stats
        self.meta_cache_max_rows = meta_cache_max_rows
        self.max_driver_docs = max_driver_docs
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
                .select("term", "block_id", "n_docs", "max_tf", "max_norm_byte")
                .collect()
            )
            by_term: dict[str, list] = {t: [] for t in missing}
            for r in rows:
                by_term[r["term"]].append(
                    (r["block_id"], r["n_docs"], r["max_tf"], r["max_norm_byte"])
                )
            for t, lst in by_term.items():
                if self._meta_rows + len(lst) > self.meta_cache_max_rows:
                    self._meta[(fld, t)] = None
                    continue
                lst.sort()
                arr = np.array(lst, dtype=np.int64).reshape(-1, 4)
                self._meta[(fld, t)] = {
                    "bid": arr[:, 0], "nd": arr[:, 1],
                    "mtf": arr[:, 2], "mnb": arr[:, 3],
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

    def _fetch_packed(self, fld: str, terms: list[str], block_ids: list[int]):
        """One pushdown collect of packed block bytes (narrow: filter on a
        cached table, no shuffle)."""
        return (
            self.blocks.filter(
                (F.col("field") == fld)
                & F.col("term").isin(terms)
                & F.col("block_id").isin(block_ids)
            )
            .select("term", "block_id", "packed")
            .collect()
        )

    def _score_packed_rows(self, rows, weights: dict[str, float], fld: str) -> dict:
        """Decode + score packed rows in numpy with the exact float32 op
        order of the distributed scorer. Returns doc_id -> [f64 score sum
        of per-term f32 scores, matched-term count]."""
        cache = self._cache_np(fld)  # float32
        acc: dict[int, list] = {}
        for r in rows:
            docs, tfs, norms, _ = unpack_block_bytes(
                r["term"], int(r["block_id"]), bytes(r["packed"]), with_positions=False
            )
            w32 = np.float32(weights[r["term"]])
            tf32 = tfs.astype(np.float32)
            sc = (
                (w32 * tf32).astype(np.float32)
                / (tf32 + cache[norms]).astype(np.float32)
            ).astype(np.float32).astype(np.float64)
            for d, s in zip(docs.tolist(), sc.tolist()):
                e = acc.setdefault(d, [0.0, 0])
                e[0] += s
                e[1] += 1
        return acc

    def _seed_theta(self, bids: np.ndarray, ub_sum: np.ndarray, nd: np.ndarray,
                    terms: list[str], weights: dict[str, float], fld: str,
                    k: int, mode: str, n_terms: int) -> tuple[float | None, list[int], list]:
        """Pick seed blocks (highest ub_sum covering >= k docs, min 4 — a
        single 128-doc block's k-th score is a weak theta), fetch their
        packed bytes (one pushdown collect), score them driver-side, and
        return (theta, seed_ids, fetched_rows). theta=None => seed held
        < k docs, no pruning."""
        order = np.lexsort((bids, -ub_sum))
        covered, seed_ids = 0, []
        for i in order[: max(k, 4) * 4]:
            seed_ids.append(int(bids[i]))
            covered += int(nd[i])
            if covered >= k and len(seed_ids) >= 4:
                break
        rows = self._fetch_packed(fld, terms, seed_ids)
        acc = self._score_packed_rows(rows, weights, fld)
        if mode == "and":
            scores = [v[0] for v in acc.values() if v[1] >= n_terms]
        else:
            scores = [v[0] for v in acc.values()]
        if len(scores) < k:
            return None, seed_ids, rows
        # the distributed plan's final cast: f32(sum) viewed as double
        scores = np.sort(np.float32(scores).astype(np.float64))[::-1]
        return float(scores[k - 1]), seed_ids, rows

    def _scan_plan(self, terms: list[str], weights: dict[str, float], fld: str,
                   surviving: np.ndarray | None, k: int, mode: str,
                   n_terms: int) -> DataFrame:
        """The returned (lazy) plan: pushdown-filter surviving blocks,
        decode, score, top-k. No joins, no extra actions."""
        pred = (F.col("field") == fld) & F.col("term").isin(terms)
        if surviving is not None and len(surviving) <= _MAX_INLIST:
            pred = pred & F.col("block_id").isin([int(b) for b in surviving])
        metas = self.blocks.filter(pred).select("field", "term", "block_id", "packed")
        decoded = unpack_blocks(metas, with_positions=False)
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
        bids, ub_sum, present, nd = self._ub_arrays(meta, weights, fld)
        if mode == "and":
            keep = present >= n_terms
            bids, ub_sum, present, nd = bids[keep], ub_sum[keep], present[keep], nd[keep]
        total = len(bids)
        if total == 0:
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self._empty()
        theta, seed_ids, seed_rows = self._seed_theta(
            bids, ub_sum, nd, terms, weights, fld, k, mode, n_terms
        )
        if theta is None:
            surviving, surv_docs = bids, int(nd.sum())
        else:
            keep = ub_sum >= theta * (1.0 - _EPS)
            surviving, surv_docs = bids[keep], int(nd[keep].sum())
        self.last_stats = {"blocks_total": total, "blocks_scored": len(surviving)}

        if surv_docs <= self.max_driver_docs:
            # Small survivor set (the pruned common case): finish the top-k
            # driver-side from the packed bytes — at most one more narrow
            # collect for survivor blocks the seed fetch didn't cover. This
            # is Lucene's serving shape: the query reads only its surviving
            # blocks; no cluster job is scheduled for a k-row answer.
            extra = sorted(set(surviving.tolist()) - set(seed_ids))
            rows = list(seed_rows)
            if extra:
                rows += self._fetch_packed(fld, terms, extra)
            return self._local_topk(rows, weights, fld, k, mode, n_terms)

        use = None if len(surviving) == total else surviving
        if mode == "and" and use is None:
            # the AND candidate set itself prunes blocks missing a term —
            # keep that pushdown even when theta prunes nothing further
            use = bids
        return self._scan_plan(terms, weights, fld, use, k, mode, n_terms)

    def _local_topk_phrase(self, rows, terms: tuple[str, ...], wv: float,
                           fld: str, k: int) -> DataFrame:
        """Driver-side exact-phrase top-k over fetched candidate blocks:
        per-term doc->positions maps, shifted-set intersection
        (ExactPhraseScorer semantics), float32 BM25 with the phrase's
        summed-idf weight — identical values to the distributed plan."""
        pos_of: dict[str, dict[int, list]] = {t: {} for t in set(terms)}
        norm_of: dict[int, int] = {}
        for r in rows:
            t = r["term"]
            docs, _tfs, norms, pos = unpack_block_bytes(
                t, int(r["block_id"]), bytes(r["packed"]), with_positions=True
            )
            dst = pos_of[t]
            for d, p, nb in zip(docs.tolist(), pos or [], norms.tolist()):
                dst[d] = p
                norm_of[d] = nb
        cands = set(pos_of[terms[0]])
        for t in set(terms[1:]):
            cands &= set(pos_of[t])
        cache = self._cache_np(fld)  # float32
        wv32 = np.float32(wv)
        items = []
        for d in cands:
            inter = {p - 0 for p in pos_of[terms[0]][d]}
            for i, t in enumerate(terms[1:], start=1):
                inter &= {p - i for p in pos_of[t][d]}
                if not inter:
                    break
            pf = len(inter)
            if pf == 0:
                continue
            pf32 = np.float32(pf)
            sc = np.float32(
                np.float32(wv32 * pf32) / np.float32(pf32 + cache[norm_of[d]])
            )
            items.append((int(d), float(sc)))
        items.sort(key=lambda x: (-x[1], x[0]))
        spark = self.index.postings.sparkSession
        return spark.createDataFrame(items[:k], "doc_id long, score double")

    def _local_topk(self, rows, weights: dict[str, float], fld: str, k: int,
                    mode: str, n_terms: int) -> DataFrame:
        """Driver-side exact top-k over fetched packed blocks; returns a
        local k-row DataFrame (doc_id, score) matching the distributed
        plan's schema and float32-cast score values."""
        acc = self._score_packed_rows(rows, weights, fld)
        items = [
            (d, float(np.float32(v[0])))
            for d, v in acc.items()
            if mode != "and" or v[1] >= n_terms
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        spark = self.index.postings.sparkSession
        return spark.createDataFrame(items[:k], "doc_id long, score double")

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
        ).select("field", "term", "block_id", "n_docs", "packed", ub)

    def _score_decoded(self, metas: DataFrame, weights: dict[str, float], fld: str,
                       mode: str, n_terms: int = 0) -> DataFrame:
        decoded = unpack_blocks(metas.select("field", "term", "block_id", "packed"),
                                with_positions=False)
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
        if all(m is not None for m in meta.values()):
            sets = [set(m["bid"].tolist()) if m is not None else set() for m in meta.values()]
            cand_ids = sorted(reduce(lambda a, b: a & b, sets)) if sets else []
            total = len(reduce(lambda a, b: a | b, sets)) if sets else 0
            self.last_stats = {"blocks_total": total, "blocks_scored": len(cand_ids)}
            if not cand_ids:
                return self._empty()
            if len(cand_ids) * len(uniq) * 128 <= self.max_driver_docs:
                # small candidate set: fetch the packed bytes (positions are
                # inside) and run the shifted-positions intersect driver-side
                rows = self._fetch_packed(fld, uniq, [int(b) for b in cand_ids])
                return self._local_topk_phrase(rows, terms, wv, fld, k)
            if len(cand_ids) <= _MAX_INLIST:
                pred = pred & F.col("block_id").isin([int(b) for b in cand_ids])
            survivors = self.blocks.filter(pred).select("field", "term", "block_id", "packed")
        else:
            # fallback: distributed candidate intersection
            metas = self.blocks.filter(pred).select("field", "term", "block_id", "packed")
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
        decoded = unpack_blocks(survivors, with_positions=True)

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
