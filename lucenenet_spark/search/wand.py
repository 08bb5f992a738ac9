"""Block-max WAND top-k: safe pruning on per-block max-score bounds.

Lucene 4.8 has no max-score metadata (SURVEY.md §4.2) — its only pruning is
skip lists (doc-range) + early-termination collectors. We add the BlockMax
WAND idea (Ding & Suel, SIGIR 2011 — "Faster top-k document retrieval using
block-max indexes") on top of the reference's 128-doc block layout:

    ub(block) = weight * (k1+1) * max_tf / (max_tf + cache[max_norm_byte])

is a monotone upper bound on every BM25 score inside the block: score rises
with tf and falls with the norm-cache value, and cache[] is DECREASING in
norm_byte (a larger byte encodes a larger 1/sqrt(len), i.e. a shorter doc,
whose decoded length and hence norm is smaller) — so the block's smallest
possible norm belongs to its largest norm_byte. Two-phase exact top-k:

  1. SEED: score the highest-ub blocks covering >= k postings -> threshold
     theta = k-th best score (TakeOrdered over a handful of blocks).
  2. PRUNE: decode + score only blocks with ub >= theta*(1-eps); everything
     below cannot contain a competitive doc, so the final top-k is
     RANK-IDENTICAL to the unpruned scan (eps guards float rounding).

Distributed shape: block metadata is a DataFrame (never collected beyond
the <= k seed block ids); pruning is an ordinary filter pushed to the
parquet scan of the blocks table; decode is mapInPandas over surviving
blocks only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.blocks import unpack_blocks
from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import IndexSearcher

_EPS = 1e-6


class BlockMaxSearcher:
    """Top-k term search over the packed blocks table with BMW pruning."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame, mode: str = "lucene"):
        if mode != "lucene":
            # The packed block payload carries norm_byte but not the exact
            # doc length, and 'double' scoring needs exact dl — rejecting is
            # honest; quantized-norm scoring is the production path anyway.
            raise ValueError("BlockMaxSearcher supports mode='lucene' only (blocks store norm_byte, not dl)")
        self.index = index
        self.blocks = blocks
        self.inner = IndexSearcher(index, mode=mode)
        self.last_stats: dict = {}

    def _ub_col(self, weight_value: float, field: str | None = None):
        fld = field or self.index.default_field
        cache = self.inner._cache_col_for(fld) if self.inner.mode == "lucene" else None
        if cache is not None:
            cmin = F.element_at(cache, F.col("max_norm_byte") + F.lit(1))
        else:
            from lucenenet_spark.index.smallfloat import norm_table

            tbl = norm_table().astype(np.float64)
            arr = F.array(*[F.lit(float(v)) for v in tbl])
            decode = F.element_at(arr, F.col("max_norm_byte") + F.lit(1))
            avgdl = self.index.avgdl_double
            cmin = F.lit(self.inner.k1) * (
                F.lit(1.0 - self.inner.b) + F.lit(self.inner.b) * decode / F.lit(avgdl)
            )
        mt = F.col("max_tf").cast("double")
        return (F.lit(weight_value) * mt / (mt + cmin.cast("double"))).alias("ub")

    def topk_term(self, term: str, k: int = 10, boost: float = 1.0,
                  field: str | None = None) -> DataFrame:
        """Exact top-k (score DESC, doc_id ASC) scanning only competitive
        blocks; sets self.last_stats = {blocks_total, blocks_scored}."""
        fld = field or self.index.default_field
        stats = self.inner._term_stats([(fld, term)])
        df_, _ = stats.get((fld, term), (0, 0))
        wv = self.inner._weight_value(self.inner._idf(df_), boost, 1.0)

        meta = self.blocks.filter(
            (F.col("field") == fld) & (F.col("term") == term)
        ).select(
            "field", "term", "block_id", "n_docs", "max_tf", "max_norm_byte", "packed",
            self._ub_col(wv, fld),
        )
        meta = meta.persist()
        try:
            total = meta.count()
            if total == 0:
                self.last_stats = {"blocks_total": 0, "blocks_scored": 0}
                return self._score_blocks(meta.limit(0), wv, k, fld)

            # SEED: smallest prefix of ub-desc blocks covering >= k postings
            seed_rows = (
                meta.select("block_id", "n_docs", "ub")
                .orderBy(F.desc("ub"), F.asc("block_id"))
                .limit(max(k, 1))
                .collect()
            )
            covered, seed_ids = 0, []
            for r in seed_rows:
                seed_ids.append(r["block_id"])
                covered += r["n_docs"]
                if covered >= k:
                    break
            seed = meta.filter(F.col("block_id").isin(seed_ids))
            seed_topk = self._score_blocks(seed, wv, k, fld).collect()
            if len(seed_topk) < k:
                # not enough docs for a full heap: must scan everything
                self.last_stats = {"blocks_total": total, "blocks_scored": total}
                return self._score_blocks(meta, wv, k, fld)
            theta = seed_topk[-1]["score"]

            surviving = meta.filter(F.col("ub") >= F.lit(float(theta) * (1.0 - _EPS)))
            n_scored = surviving.count()
            self.last_stats = {"blocks_total": total, "blocks_scored": n_scored}
            return self._score_blocks(surviving, wv, k, fld)
        finally:
            meta.unpersist()

    def _score_blocks(
        self, blocks: DataFrame, weight_value: float, k: int, field: str | None = None
    ) -> DataFrame:
        postings = unpack_blocks(blocks, with_positions=False)
        scored = postings.select(
            "doc_id", self.inner._score_col(weight_value, F.col("tf"), field).alias("score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
