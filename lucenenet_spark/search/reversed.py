"""Reversed-term index: the leading-wildcard acceleration pattern.

Reimplements the intent of Analysis/Reverse/ReverseStringFilter.cs:
Lucene indexes each token reversed (usually into a companion field) so
a leading wildcard `*suffix` — which would otherwise scan the whole
term dictionary — rewrites to a PREFIX query over the reversed terms
and walks only one dictionary block range.

Spark-first shape: the reversed dictionary is a (rterm, doc_id) frame
derived from the index once. `rterm.startswith(...)` compiles to a
`StartsWith` filter that reaches the parquet scan (PushedFilters) when
the frame is persisted term-sorted — exactly the reference's
term-dictionary seek, expressed as storage-order pruning. At 100 TB
this is a one-time map of the postings (no shuffle: doc locality is
irrelevant for a dictionary-range scan) and each query prunes to the
row groups whose [min, max] rterm range intersects the prefix.

ReverseStringFilter itself (token-stream reversal for index-time use)
is `ReversedAnalyzer` in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ReversedTermIndex:
    """Companion reversed-term dictionary for leading wildcards.

    `save_path` (optional) materializes the frame sorted by rterm so
    the prefix predicate prunes parquet row groups via min/max stats —
    the scale path; without it the frame is cached in memory (tests)."""

    def __init__(self, idx, save_path: str | None = None):
        postings = idx.postings if hasattr(idx, "postings") else idx
        rev = (
            postings.select(
                F.reverse(F.col("term")).alias("rterm"), "doc_id"
            ).distinct()
        )
        if save_path is not None:
            rev.sort("rterm").write.mode("overwrite").parquet(save_path)
            self.rev = postings.sparkSession.read.parquet(save_path)
        else:
            self.rev = rev.cache()

    def docset(self, pattern: str) -> DataFrame:
        """Doc ids matching a leading-wildcard pattern `*suffix`
        (CONSTANT_SCORE rewrite, like the PrefixQuery docset path)."""
        if not pattern.startswith("*") or "*" in pattern[1:] \
                or "?" in pattern:
            raise ValueError(
                "ReversedTermIndex handles pure leading-wildcard "
                f"patterns ('*suffix'); got {pattern!r}"
            )
        suffix = pattern[1:]
        return (
            self.rev.where(F.col("rterm").startswith(suffix[::-1]))
            .select("doc_id")
            .distinct()
        )


class ReversedAnalyzer:
    """ReverseStringFilter.cs as an analyzer wrapper: every emitted
    token is reversed (positions/norms unchanged)."""

    def __init__(self, base):
        self.base = base

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False

    def tokenize_batch(self, texts):
        import numpy as np

        r, t, p, fl = self.base.tokenize_batch(texts)
        if len(t):
            t = np.array([s[::-1] for s in t], dtype=object)
        return r, t, p, fl
