"""Miscellaneous token filters as a composable post-tokenize chain.

Reference classes (src/Lucene.Net.Analysis.Common/Analysis/
Miscellaneous/ + Core/):
- LengthFilter: keep tokens whose length is within [min, max]; a
  FilteringTokenFilter, so removed tokens leave POSITION HOLES.
- KeepWordFilter: keep only tokens in the given set (holes likewise).
- LimitTokenCountFilter (consumeAllTokens=false): emit only the first
  ``limit`` tokens of each document, then stop.

FilteredAnalyzer wraps any engine analyzer and applies the three stages
to its emitted stream in the reference's filter order (filtering stages
first, the count limit last — it counts tokens that reached it). Field
lengths count the final survivors, positions keep the upstream pre-filter
indices (hole semantics shared with the stop filter)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer


class FilteredAnalyzer(StandardAnalyzer):
    def __init__(
        self,
        inner: StandardAnalyzer | None = None,
        *,
        min_length: int | None = None,
        max_length: int | None = None,
        keep_words: frozenset[str] | None = None,
        limit_tokens: int | None = None,
    ) -> None:
        self.inner = inner or StandardAnalyzer()
        # expose the inner config the engine reads (stopwords for query
        # analysis, max_token_length for the inverter)
        super().__init__(
            stopwords=self.inner.stopwords,
            max_token_length=self.inner.max_token_length,
            lowercase=self.inner.lowercase,
            token_re=self.inner.token_re,
        )
        self.min_length = min_length
        self.max_length = max_length
        self.keep_words = keep_words
        self.limit_tokens = limit_tokens

    def tokenize_batch(self, texts: pd.Series):
        n_rows = len(pd.Series(texts))
        rows, terms, positions, _ = self.inner.tokenize_batch(pd.Series(texts))
        if len(terms):
            keep = np.ones(len(terms), dtype=bool)
            s = pd.Series(terms)
            if self.min_length is not None:
                keep &= s.str.len().to_numpy() >= self.min_length
            if self.max_length is not None:
                keep &= s.str.len().to_numpy() <= self.max_length
            if self.keep_words is not None:
                keep &= s.isin(self.keep_words).to_numpy()
            rows, terms, positions = rows[keep], terms[keep], positions[keep]
        if self.limit_tokens is not None and len(terms):
            # rank of each surviving token within its row (arrays are
            # row-ordered): row-change boundaries reset the counter
            first = np.concatenate(([0], np.flatnonzero(np.diff(rows)) + 1))
            starts = np.zeros(len(rows), dtype=np.int64)
            starts[first] = first
            starts = np.maximum.accumulate(starts)
            rank = np.arange(len(rows), dtype=np.int64) - starts
            keep = rank < self.limit_tokens
            rows, terms, positions = rows[keep], terms[keep], positions[keep]
        field_lens = np.bincount(rows, minlength=n_rows).astype(np.int32)
        return rows, terms, positions, field_lens

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
