"""ClassicAnalyzer: the pre-UAX#29 Lucene grammar + ClassicFilter.

Reimplements the semantics of the reference's classic chain —
ClassicTokenizer -> ClassicFilter -> LowerCaseFilter -> StopFilter
(src/Lucene.Net.Analysis.Common/Analysis/Standard/ClassicAnalyzer.cs:117-124,
ClassicTokenizerImpl.cs JFlex grammar, ClassicFilter.cs:62-101) — as an
ordered regex alternation over the flat-numpy batch tokenizer.

Grammar subset implemented (ASCII forms; the token *text* is what matters,
the reference's type tags only drive ClassicFilter, which is folded in):

- EMAIL     local@host.tld                        kept whole
- ACRONYM   single letters each followed by '.'   ClassicFilter strips dots
            (``u.s.a.`` -> ``usa``; requires the trailing dot, >=2 groups,
            per the grammar ``ALPHA "." (ALPHA ".")+`` with LETTER atoms)
- NUM       alnum segments joined by ``[._,/-]`` with at least one digit
            (``1,000`` ``r2/d2`` ``wi-fi5``) kept whole — documented
            superset of the reference's alternating HAS_DIGIT grammar
- HOST      alnum segments joined by dots (``lucene.apache.org``, and the
            trailing-dot-less ``u.s.a``) kept whole WITH dots
- COMPANY   letters joined by ``&``/``@`` (``at&t``) kept whole
- APOSTROPHE letters joined by ``'`` (``o'reilly``, ``don't``) kept whole;
            ClassicFilter strips a trailing ``'s``/``'S``
- ALPHANUM  plain letter/digit runs
- non-ASCII text falls back to the standard tokenizer's script classes
  (the classic grammar's Unicode LETTER ranges, same emitted runs here)

ClassicFilter ordering parity: the filter runs BEFORE LowerCase/Stop, so a
possessive like ``it's`` becomes ``it`` and is THEN stop-removed — this
implementation applies the transform on the raw token dictionary before
the stop mask for exactly that reason.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import (
    _TOKEN_RE,
    DEFAULT_MAX_TOKEN_LENGTH,
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    tokenize_batch,
)

# Ordered alternation: EMAIL > ACRONYM > NUM > HOST > COMPANY > APOSTROPHE
# > ALPHANUM > standard-class fallback. Order is load-bearing: ACRONYM
# needs its trailing dot before HOST sees a shorter dotted prefix, and the
# digit lookahead keeps hyphenated plain words (``foo-bar``) OUT of NUM so
# they split into parts like the reference grammar does. The negative
# lookahead on ACRONYM emulates JFlex longest-match: ``u.s.a`` (no final
# dot) must fall through to HOST whole rather than match ``u.s.`` short.
_CLASSIC_RE = re.compile(
    r"[A-Za-z0-9]+(?:[._\-][A-Za-z0-9]+)*@[A-Za-z0-9]+(?:[.\-][A-Za-z0-9]+)+"
    r"|(?:[A-Za-z]\.){2,}(?![A-Za-z0-9])"
    r"|(?=[A-Za-z0-9._,/\-]*\d)[A-Za-z0-9]+(?:[._,/\-][A-Za-z0-9]+)+"
    r"|[A-Za-z0-9]+(?:\.[A-Za-z0-9]+)+"
    r"|[A-Za-z]+(?:[&@][A-Za-z]+)+"
    r"|[A-Za-z]+(?:'[A-Za-z]+)+"
    r"|[A-Za-z0-9]+"
    r"|" + _TOKEN_RE.pattern
)

_ACRONYM_RE = re.compile(r"^(?:[A-Za-z]\.){2,}$")
_APOSTROPHE_RE = re.compile(r"^[A-Za-z]+(?:'[A-Za-z]+)+$")


def classic_filter_series(terms: pd.Series) -> pd.Series:
    """Vectorized ClassicFilter (ClassicFilter.cs:62-101): strip dots from
    ACRONYM-shaped tokens, strip a trailing 's / 'S from APOSTROPHE-shaped
    tokens. Shape classification replaces the reference's type attribute —
    the shapes are exactly the grammar productions the types tag."""
    s = terms.astype(str)
    acro = s.str.match(_ACRONYM_RE)
    if acro.any():
        s = s.mask(acro, s.str.replace(".", "", regex=False))
    poss = s.str.match(_APOSTROPHE_RE) & s.str.lower().str.endswith("'s")
    if poss.any():
        s = s.mask(poss, s.str.slice(0, -2))
    return s


class ClassicAnalyzer(StandardAnalyzer):
    """ClassicTokenizer + ClassicFilter + LowerCase + Stop
    (ClassicAnalyzer.cs:117-124). The filter transform runs on the raw
    token dictionary (unique tokens only) before the stop mask, preserving
    the reference's filter order."""

    def __init__(
        self,
        stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ) -> None:
        super().__init__(
            stopwords=stopwords,
            max_token_length=max_token_length,
            lowercase=True,
            token_re=_CLASSIC_RE,
        )

    def tokenize_batch(self, texts: pd.Series):
        n_rows = len(pd.Series(texts))
        rows, terms, positions, _ = tokenize_batch(
            pd.Series(texts),
            lowercase=False,
            stopwords=None,
            max_token_length=self.max_token_length,
            token_re=self.token_re,
        )
        if len(terms):
            codes, uniques = pd.factorize(pd.Series(terms), sort=False)
            xformed = (
                classic_filter_series(pd.Series(uniques))
                .str.lower()
                .to_numpy(dtype=object)
            )
            terms = xformed[codes]
        if self.stopwords and len(terms):
            keep = ~pd.Series(terms).isin(self.stopwords).to_numpy()
            rows, terms, positions = rows[keep], terms[keep], positions[keep]
        field_lens = np.bincount(rows, minlength=n_rows).astype(np.int32)
        return rows, terms, positions, field_lens

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
