"""Miscellaneous token filters: Scandinavian normalization/folding and
hyphenated-word reassembly.

- scandinavian_normalize / ScandinavianNormalizationAnalyzer —
  `Analysis/Miscellaneous/ScandinavianNormalizationFilter.cs`:
  transliterated digraphs and Swedish-style umlauts collapse to the
  Norwegian/Danish canonical letters (aa/ao -> å, ae/ä -> æ,
  oe/oo/ö -> ø), so `blaabaersyltetöj` == `blåbærsyltetøj`.
- scandinavian_fold / ScandinavianFoldingAnalyzer —
  `ScandinavianFoldingFilter.cs`: the more aggressive interop fold onto
  plain a/o (å/ä/æ/aa/ae/ao -> a, ö/ø/oe/oo -> o), so `räksmörgås`,
  `ræksmørgås` and `raeksmoergaas` all match `raksmorgas`.
- HyphenatedWordsAnalyzer — `HyphenatedWordsFilter.cs`: a token ending
  in '-' merges with the following token(s) — repairing line-break
  hyphenation in extracted print/web text ("hyphen- ated" ->
  "hyphenated", chains merge transitively, a dangling final hyphen is
  kept on the fragment). Lucene emits the merged token with the FIRST
  fragment's attributes and consecutive position increments, which the
  string-level merge below reproduces for values and positions
  (character offsets are not tracked by this engine).

Both Scandinavian filters are sequential single-pass rewrites over the
character buffer (a collapsed digraph is consumed before the scan
moves on), replicated verbatim; validated against the reference's own
CheckOneTerm vectors in tests/test_misc_filters.py.
"""

from __future__ import annotations

import re

import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.analysis.snowball import _SnowballAnalyzer

_VOW_A = {"a": "å", "A": "Å"}


def scandinavian_normalize(word: str) -> str:
    """ScandinavianNormalizationFilter.cs: ä->æ Ä->Æ ö->ø Ö->Ø;
    aa/ao->å, ae->æ, oe/oo->ø (with the reference's exact case
    combinations), scanning left to right and consuming each collapsed
    digraph."""
    buf = list(word)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c == "ä":
            buf[i] = "æ"
        elif c == "Ä":
            buf[i] = "Æ"
        elif c == "ö":
            buf[i] = "ø"
        elif c == "Ö":
            buf[i] = "Ø"
        elif i + 1 < len(buf):
            nxt = buf[i + 1]
            if c == "a" and nxt in "aoAO":
                del buf[i + 1]
                buf[i] = "å"
            elif c == "A" and nxt in "aAoO":
                del buf[i + 1]
                buf[i] = "Å"
            elif c == "a" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "æ"
            elif c == "A" and nxt in "eE":
                del buf[i + 1]
                buf[i] = "Æ"
            elif c == "o" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "ø"
            elif c == "O" and nxt in "eEoO":
                del buf[i + 1]
                buf[i] = "Ø"
        i += 1
    return "".join(buf)


def scandinavian_fold(word: str) -> str:
    """ScandinavianFoldingFilter.cs: å/ä/æ -> a, Å/Ä/Æ -> A,
    ö/ø -> o, Ö/Ø -> O; the digraphs aa/ae/ao (any case of the second
    letter) drop it, as do oe/oo — same sequential scan semantics."""
    buf = list(word)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "öø":
            buf[i] = "o"
        elif c in "ÖØ":
            buf[i] = "O"
        elif i + 1 < len(buf):
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


class _MiscFilterAnalyzer(_SnowballAnalyzer):
    """Standard chain (English stop set by default, matching the gate
    prelude) + a dictionary-level single-token rewrite."""

    def __init__(self, stopwords=None, **kw):
        from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

        super().__init__(
            ENGLISH_STOP_WORDS if stopwords is None else stopwords, **kw
        )


class ScandinavianNormalizationAnalyzer(_MiscFilterAnalyzer):
    """Standard chain + ScandinavianNormalizationFilter."""

    @property
    def _stem(self):
        return scandinavian_normalize


class ScandinavianFoldingAnalyzer(_MiscFilterAnalyzer):
    """Standard chain + ScandinavianNormalizationFilter +
    ScandinavianFoldingFilter — the reference's interop combination
    (normalize first, then fold), so `bätch`, `baatch` and `båtch` all
    index as `batch`."""

    @property
    def _stem(self):
        return lambda w: scandinavian_fold(scandinavian_normalize(w))


class KeywordRepeatStemAnalyzer(StandardAnalyzer):
    """The canonical exact+stemmed chain: KeywordRepeatFilter ->
    PorterStemFilter -> RemoveDuplicatesTokenFilter
    (`Analysis/Miscellaneous/{KeywordRepeatFilter,
    RemoveDuplicatesTokenFilter}.cs`). Every token emits its surface
    form AND its Porter stem at the SAME position (posIncrement 0
    overlay); when the stem equals the surface form the duplicate is
    dropped (RemoveDuplicates' same-term-same-position rule). Norms
    count surface tokens only (discountOverlaps), so exact-match
    queries score identically to a plain index while stemmed queries
    gain recall."""

    def __init__(self, stopwords=None, **kw):
        from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

        super().__init__(
            stopwords=ENGLISH_STOP_WORDS if stopwords is None else stopwords,
            lowercase=True,
            **kw,
        )

    def tokenize_batch(self, texts: pd.Series):
        import numpy as np

        from lucenenet_spark.analysis.porter import porter_stem

        row_idx, terms, positions, field_lens = super().tokenize_batch(
            pd.Series(texts)
        )
        if not len(terms):
            return row_idx, terms, positions, field_lens
        codes, uniques = pd.factorize(pd.Series(terms), sort=False)
        stems = np.array([porter_stem(u) for u in uniques], dtype=object)
        injected = stems[codes]
        differs = (injected != terms) & (injected != "")
        out_r = np.concatenate([row_idx, row_idx[differs]])
        out_t = np.concatenate([terms, injected[differs]])
        out_p = np.concatenate([positions, positions[differs]])
        order = np.lexsort((out_p, out_r))
        return (
            out_r[order],
            out_t[order].astype(object),
            out_p[order].astype(np.int32),
            field_lens,
        )


_WS = re.compile(r"\s+")


def merge_hyphenated(text: str) -> str:
    """HyphenatedWordsFilter.cs semantics at string level: a whitespace
    token ending in '-' buffers (hyphen dropped) and merges with the
    next token; chains merge transitively; a final dangling fragment
    keeps its trailing '-'."""
    out: list[str] = []
    buf: str | None = None
    for tok in _WS.split(text):
        if not tok:
            continue
        if tok.endswith("-") and len(tok) > 0:
            buf = (buf or "") + tok[:-1]
        elif buf is None:
            out.append(tok)
        else:
            out.append(buf + tok)
            buf = None
    if buf is not None:
        out.append(buf + "-")
    return " ".join(out)


class HyphenatedWordsAnalyzer(StandardAnalyzer):
    """Standard analyzer with hyphenated-word reassembly applied to the
    raw token stream before tokenization — repairing line-break
    hyphenation so split words index as their whole forms."""

    def tokenize_batch(self, texts: pd.Series):
        merged = pd.Series(texts).map(merge_hyphenated)
        return super().tokenize_batch(merged)
