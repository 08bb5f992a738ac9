"""Analysis chain: StandardAnalyzer-equivalent tokenization, vectorized.

Reimplements the *semantics* of the reference analysis chain
(StandardTokenizer -> LowerCaseFilter -> StopFilter; see
src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardAnalyzer.cs:102-108)
as flat-numpy batch operations suitable for `mapInPandas` — no per-row Python
in the hot path (per-token work happens in C-level numpy/pandas kernels).

Parity contract implemented here:
- Tokenization: ASCII/Latin subset of the UAX#29 word-break rules used by
  StandardTokenizer (reference JFlex DFA:
  src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizerImpl.cs).
  A token is an alphanumeric run, optionally joined across a single `.` or
  `'` (UAX#29 MidNumLet/MidLetter) or `_` (ExtendNumLet). Tokens longer than
  255 chars are dropped (StandardAnalyzer.cs:52 DEFAULT_MAX_TOKEN_LENGTH).
  Full Unicode segmentation (SE-Asian, ideographic classes) is out of scope;
  the synthetic webtext corpus is pinned to the supported alphabet.
- LowerCaseFilter (Analysis/Core/LowerCaseFilter.cs): ASCII + Latin-1
  lowercasing via str.lower().
- StopFilter (Analysis/Core/StopFilter.cs:135): removes the exact 33-word
  English stop set (Core/StopAnalyzer.cs:50-57) while *keeping position
  holes*: a surviving token's position equals its pre-filter token index
  (FilteringTokenFilter.cs:87-100 accumulates skipped positions into the next
  posIncrement).
- Field length = number of EMITTED tokens (stopwords excluded), matching
  FieldInvertState.Length which only counts consumed tokens
  (src/Lucene.Net/Index/DocInverterPerField.cs:195).
"""

from __future__ import annotations

import re
from itertools import chain

import numpy as np
import pandas as pd

# Exact stop set from reference Analysis/Core/StopAnalyzer.cs:50-57.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# ASCII/Latin subset of UAX#29 word-break: alnum runs joined by MidNumLet
# ('.', '\'') between alphanumerics; '_' (ExtendNumLet) treated as a joiner.
_TOKEN_RE = re.compile(r"[A-Za-z0-9_À-ɏ]+(?:[.'][A-Za-z0-9_À-ɏ]+)*")

DEFAULT_MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.cs:52


def tokenize_batch(
    texts: pd.Series,
    *,
    lowercase: bool = True,
    stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    token_re: re.Pattern = _TOKEN_RE,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch of documents into flat (row_idx, term, position) arrays.

    Returns ``(row_idx, terms, positions, field_lengths)`` where the first
    three are parallel flat arrays over all *emitted* tokens of the batch and
    ``field_lengths[i]`` is the emitted-token count of input row i (the norm
    length; stop words excluded per DocInverterPerField.cs:195).

    Positions keep stopword holes: ``positions`` is the pre-filter token
    index within the document (FilteringTokenFilter.cs:87-100).
    """
    n_rows = len(texts)
    tok_lists = texts.fillna("").astype(str).str.findall(token_re)
    counts = tok_lists.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        empty = np.array([], dtype=object)
        return (
            np.array([], dtype=np.int64),
            empty,
            np.array([], dtype=np.int32),
            np.zeros(n_rows, dtype=np.int32),
        )

    flat_terms = np.fromiter(chain.from_iterable(tok_lists), dtype=object, count=total)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    # raw position = token index within its document (0-based, pre-filter)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    positions = (np.arange(total, dtype=np.int64) - offsets[row_idx]).astype(np.int32)

    s = pd.Series(flat_terms)
    if lowercase:
        s = s.str.lower()
    keep = s.str.len().to_numpy() <= max_token_length
    if stopwords:
        keep &= ~s.isin(stopwords).to_numpy()

    kept_rows = row_idx[keep]
    field_lengths = np.bincount(kept_rows, minlength=n_rows).astype(np.int32)
    return kept_rows, s.to_numpy()[keep], positions[keep], field_lengths


class StandardAnalyzer:
    """StandardTokenizer + LowerCase + Stop filter pipeline.

    Mirrors reference StandardAnalyzer.CreateComponents
    (Analysis/Standard/StandardAnalyzer.cs:102-108); StandardFilter is a
    no-op in 4.x and therefore omitted.
    """

    def __init__(
        self,
        stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        lowercase: bool = True,
        token_re: re.Pattern = _TOKEN_RE,
    ) -> None:
        self.stopwords = stopwords
        self.max_token_length = max_token_length
        self.lowercase = lowercase
        self.token_re = token_re

    def tokenize_batch(self, texts: pd.Series):
        return tokenize_batch(
            texts,
            lowercase=self.lowercase,
            stopwords=self.stopwords,
            max_token_length=self.max_token_length,
            token_re=self.token_re,
        )

    def tokenize_text(self, text: str) -> list[tuple[str, int]]:
        """Driver-side single-string tokenization (query analysis path).

        The same analyzer runs over query text as over indexed text, so a
        parsed phrase honours stopword holes — mirrors
        Util/QueryBuilder.cs:89-170 CreateFieldQuery.
        """
        _, terms, positions, _ = self.tokenize_batch(pd.Series([text]))
        return list(zip(terms.tolist(), positions.tolist()))

    def terms(self, text: str) -> list[str]:
        return [t for t, _ in self.tokenize_text(text)]


class WhitespaceAnalyzer(StandardAnalyzer):
    """WhitespaceTokenizer equivalent (Analysis/Core/WhitespaceTokenizer.cs):
    split on whitespace, no lowercasing, no stopwords."""

    def __init__(self) -> None:
        super().__init__(
            stopwords=None,
            lowercase=False,
            token_re=re.compile(r"\S+"),
            max_token_length=DEFAULT_MAX_TOKEN_LENGTH,
        )
