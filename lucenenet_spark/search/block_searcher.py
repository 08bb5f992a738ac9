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
        skip-list analogue as a groupBy count); same summed-ub bound.

Two-phase exact top-k (rank-identical to the unpruned scan):
  1. SEED: decode + score the highest-ub blocks covering >= k docs ->
     theta = k-th best score.
  2. PRUNE: decode + score only blocks with ub_sum >= theta*(1-eps);
     everything below cannot contain a competitive doc.

All distributed-shape: block metadata stays a DataFrame (only <= ~k seed
block ids are collected), pruning is a pushed-down filter on the blocks
parquet, decode runs only over surviving blocks.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.blocks import pack_postings, unpack_blocks
from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import IndexSearcher, _f32

_EPS = 1e-6


class BlockIndexSearcher:
    """Top-k serving over packed 128-doc blocks (mode='lucene' scoring —
    blocks carry the quantized norm byte, exactly what BM25 needs)."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame | None = None,
                 collect_stats: bool = True):
        """collect_stats=False skips the blocks_total / blocks_scored
        counts (2 of the 4 Spark actions per query) — the serving-latency
        mode; stats mode is for benchmarking/verification."""
        self.index = index
        self.blocks = blocks if blocks is not None else pack_postings(index.postings)
        self.inner = IndexSearcher(index, mode="lucene")
        self.collect_stats = collect_stats
        self.last_stats: dict = {}

    # ------------------------------------------------------------- helpers
    def _weights(self, term_boosts: dict[str, float], fld: str) -> dict[str, float]:
        stats = self.inner._term_stats([(fld, t) for t in term_boosts])
        return {
            t: self.inner._weight_value(
                self.inner._idf(stats.get((fld, t), (0, 0))[0]), b, 1.0
            )
            for t, b in term_boosts.items()
        }

    def _metas(self, terms: list[str], weights: dict[str, float], fld: str) -> DataFrame:
        """Per-(term, block) metadata rows with the term's block upper
        bound ub = wv * max_tf / (max_tf + cache[max_norm_byte]) (cache is
        DECREASING in norm_byte, so max_norm_byte gives the smallest
        possible norm — see wand.py derivation)."""
        cache = self.inner._cache_col_for(fld)
        wmap = F.create_map(*[x for t, w in weights.items() for x in (F.lit(t), F.lit(float(w)))])
        cmin = F.element_at(cache, F.col("max_norm_byte") + F.lit(1))
        mt = F.col("max_tf").cast("double")
        ub = (wmap[F.col("term")] * mt / (mt + cmin.cast("double"))).alias("ub")
        return self.blocks.filter(
            (F.col("field") == fld) & (F.col("term").isin(terms))
        ).select("field", "term", "block_id", "n_docs", "packed", ub)

    def _score_decoded(self, metas: DataFrame, weights: dict[str, float], fld: str,
                       mode: str, n_terms: int = 0, with_positions: bool = False) -> DataFrame:
        """Decode blocks -> per-(term, doc) scores -> compose.
        mode='or': groupBy sum; mode='and': keep docs matched by all
        n_terms, sum scores."""
        decoded = unpack_blocks(metas.select("field", "term", "block_id", "packed"),
                                with_positions=with_positions)
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
        """Seed -> theta -> prune -> exact score, on block_id-aligned
        summed upper bounds."""
        metas = metas.persist()
        try:
            by_block = metas.groupBy("block_id").agg(
                F.sum("ub").alias("ub_sum"),
                F.max("n_docs").alias("nd"),
                F.count(F.lit(1)).alias("terms_present"),
            )
            if mode == "and":
                # skip-list Advance analogue: a conjunction doc needs every
                # term present in its block
                by_block = by_block.filter(F.col("terms_present") >= n_terms)
            by_block = by_block.persist()
            total = by_block.count() if self.collect_stats else None
            if total == 0:
                self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
                return self._score_decoded(metas.limit(0), weights, fld, mode, n_terms)

            seed_rows = (
                by_block.select("block_id", "nd", "ub_sum")
                .orderBy(F.desc("ub_sum"), F.asc("block_id"))
                .limit(max(k, 4))
                .collect()
            )
            # Seed until >= k docs covered, but never fewer than 4 blocks:
            # a single 128-doc block usually holds only a handful of
            # competitive docs, so its k-th score is a weak theta that
            # prunes nothing; a few extra seed blocks cost one decode each
            # and sharpen theta to the true top-k neighborhood.
            covered, seed_ids = 0, []
            for r in seed_rows:
                seed_ids.append(r["block_id"])
                covered += r["nd"]
                if covered >= k and len(seed_ids) >= 4:
                    break
            seed_metas = metas.filter(F.col("block_id").isin(seed_ids))
            if not seed_rows:
                self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
                return self._score_decoded(metas.limit(0), weights, fld, mode, n_terms)
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
            survivors = metas.join(F.broadcast(surviving_ids), "block_id")
            n_scored = surviving_ids.count() if self.collect_stats else None
            self.last_stats = {"blocks_total": total, "blocks_scored": n_scored}
            out = self._score_decoded(survivors, weights, fld, mode, n_terms)
            return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        finally:
            metas.unpersist()

    # ------------------------------------------------------------- public
    def topk_term(self, term: str, k: int = 10, boost: float = 1.0,
                  field: str | None = None) -> DataFrame:
        return self.topk_or({term: boost}, k, field)

    def topk_or(self, term_boosts: dict[str, float], k: int = 10,
                field: str | None = None) -> DataFrame:
        """Multi-term disjunction with aligned block-max WAND pruning
        (DisjunctionSumScorer semantics, scores rank-identical to
        IndexSearcher's OR)."""
        fld = field or self.index.default_field
        weights = self._weights(term_boosts, fld)
        metas = self._metas(list(term_boosts), weights, fld)
        return self._two_phase(metas, weights, fld, k, "or", len(term_boosts))

    def topk_and(self, terms: list[str], k: int = 10,
                 field: str | None = None) -> DataFrame:
        """Conjunction: block-range intersection (every term present in
        the block — the skip-list Advance analogue) + summed-ub pruning
        (ConjunctionScorer semantics)."""
        fld = field or self.index.default_field
        weights = self._weights({t: 1.0 for t in terms}, fld)
        metas = self._metas(terms, weights, fld)
        return self._two_phase(metas, weights, fld, k, "and", len(terms))

    def topk_phrase(self, terms: tuple[str, ...], k: int = 10,
                    field: str | None = None) -> DataFrame:
        """Exact phrase over packed blocks: candidate blocks = block_ids
        where ALL phrase terms are present (block-range intersection);
        decode positions only for those; then the usual shifted-positions
        intersect (ExactPhraseScorer.cs) scored with summed idf."""
        fld = field or self.index.default_field
        stats = self.inner._term_stats([(fld, t) for t in terms])
        if any((fld, t) not in stats for t in terms):
            self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
            return self.inner._empty_scored()
        idf_sum = np.float32(0.0)
        for t in terms:
            idf_sum = _f32(idf_sum + _f32(self.inner._idf(stats[(fld, t)][0])))
        wv = self.inner._weight_value(float(idf_sum), 1.0, 1.0)

        metas = self.blocks.filter(
            (F.col("field") == fld) & (F.col("term").isin(list(terms)))
        ).select("field", "term", "block_id", "packed")
        cand = (
            metas.groupBy("block_id")
            .agg(F.count(F.lit(1)).alias("tp"))
            .filter(F.col("tp") >= len(terms))
            .select("block_id")
        )
        total = metas.select("block_id").distinct().count()
        survivors = metas.join(F.broadcast(cand), "block_id")
        self.last_stats = {
            "blocks_total": total,
            "blocks_scored": cand.count(),
        }
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
