"""ICU folding (Lucene.Net.Analysis.ICU subset).

Re-expresses ``ICUFoldingFilter`` (reference
``Lucene.Net.Analysis.Icu/ICUFoldingFilter.cs``, which applies the
UTR#30 ``utr30.nrm`` compiled normalizer: accent removal + case folding
+ canonical-duplicate folding + compatibility folding) as a
stdlib-Unicode pipeline:

    NFKC  ->  full case fold  ->  NFD  ->  strip combining marks (Mn)
          ->  NFC

which covers the accent/case/compat bulk of UTR#30 (the exotic
single-char foldings in the reference's binary table — e.g. dashes,
spaces, Hangul jamo width — land under NFKC's compatibility mapping).
Scope note: the combining-mark strip enumerates the BMP's ``Mn``
category (built once per process from ``unicodedata``); supplementary-
plane combining marks pass through unchanged.

:class:`ICUFoldingAnalyzer` applies the fold to the RAW text before
tokenization (char-filter placement) rather than after the stop filter,
so stopwords in decorated text ("thé") are still recognized — the
composition a user of ``ICUNormalizer2CharFilter`` + StandardAnalyzer
gets, and the one that keeps folded and plain corpora index-identical.
"""

from __future__ import annotations

import sys
import unicodedata

import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer

__all__ = ["icu_fold", "fold_icu_series", "ICUFoldingAnalyzer"]

_MN_TABLE: dict[int, None] | None = None


def _mn_table() -> dict[int, None]:
    """str.translate deletion table for BMP combining marks, built once."""
    global _MN_TABLE
    if _MN_TABLE is None:
        _MN_TABLE = {
            cp: None
            for cp in range(0x10000)
            if unicodedata.category(chr(cp)) == "Mn"
        }
    return _MN_TABLE


def icu_fold(text: str) -> str:
    """NFKC + case fold + diacritic strip + NFC over one string."""
    if not text:
        return text
    folded = unicodedata.normalize("NFKC", text).casefold()
    stripped = unicodedata.normalize("NFD", folded).translate(_mn_table())
    return unicodedata.normalize("NFC", stripped)


def fold_icu_series(s: pd.Series) -> pd.Series:
    """Vectorized-ish fold over a pandas string Series (one Python call
    per row; each stage is a C-level str op)."""
    table = _mn_table()
    nfkc = unicodedata.normalize
    return s.map(
        lambda x: nfkc("NFC", nfkc("NFD", nfkc("NFKC", x).casefold()).translate(table))
        if isinstance(x, str)
        else x
    )


class ICUFoldingAnalyzer(StandardAnalyzer):
    """StandardAnalyzer over ICU-folded input text (fold-as-char-filter;
    see module docstring for the placement rationale)."""

    def tokenize_batch(self, texts: pd.Series):
        return super().tokenize_batch(fold_icu_series(texts))

    def tokenize_batch_arrow(self, texts):
        import pyarrow as pa

        s = texts.to_pandas() if not isinstance(texts, pd.Series) else texts
        folded = fold_icu_series(s)
        return super().tokenize_batch_arrow(pa.array(folded, type=pa.string()))
