"""Back-compat shim: single-term block-max WAND.

Round 2 shipped BlockMaxSearcher (single-term) and BlockIndexSearcher
(term/OR/AND/phrase) with two diverging copies of the ub-bound and
seed/prune logic; round 3 collapses them — BlockMaxSearcher now just
delegates to BlockIndexSearcher.topk_term (same rank-identical two-phase
pruning, driver-resident block metadata). See block_searcher.py for the
design and the Ding & Suel SIGIR'11 derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.block_searcher import BlockIndexSearcher


class BlockMaxSearcher:
    """Thin delegate kept for API stability (tests, notebooks)."""

    def __init__(self, index: InvertedIndex, blocks: DataFrame, mode: str = "lucene"):
        if mode != "lucene":
            # The packed block payload carries norm_byte but not the exact
            # doc length, and 'double' scoring needs exact dl — rejecting is
            # honest; quantized-norm scoring is the production path anyway.
            raise ValueError(
                "BlockMaxSearcher supports mode='lucene' only (blocks store norm_byte, not dl)"
            )
        self._bs = BlockIndexSearcher(index, blocks)

    @property
    def last_stats(self) -> dict:
        return self._bs.last_stats

    def topk_term(self, term: str, k: int = 10, boost: float = 1.0,
                  field: str | None = None) -> DataFrame:
        return self._bs.topk_term(term, k, boost, field)
