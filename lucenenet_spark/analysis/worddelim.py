"""WordDelimiterFilter: intra-word split/catenate normalization.

Reimplements the semantics of the reference filter
(src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/WordDelimiterFilter.cs,
WordDelimiterIterator.cs) behind a whitespace tokenizer — the composition
the reference documents (the standard tokenizer already strips the
intra-word punctuation this filter needs to see).

Subword boundaries inside a token:
- any non-alphanumeric char is a delimiter (consumed, never emitted)
- lower->UPPER case transition when ``split_on_case_change``
  (``PowerShot`` -> Power|Shot); an UPPER run followed by lower splits
  before the run's last char (``USAToday`` -> USA|Today)
- letter<->digit transition when ``split_on_numerics``
  (``WiFi5`` -> Wi|Fi|5)
- a trailing ``'s``/``'S`` is stripped first when
  ``stem_english_possessive`` (``O'Neil's`` -> O|Neil)

Emission (positions follow the reference: each generated part advances the
position by 1; catenations and the preserved original overlap, posIncr 0):
- alpha parts when ``generate_word_parts``; digit parts when
  ``generate_number_parts``
- ``catenate_words`` / ``catenate_numbers``: each maximal same-type run
  joined, overlapping the run's first subword (or standing alone as the
  run's emission when generation is off)
- ``catenate_all``: all parts joined, emitted at the FIRST part's position
- ``preserve_original``: the raw token at the incoming position, the first
  part overlapping it
- a boundary-free token passes through unchanged regardless of the
  generate flags (the reference's single-subword fast path,
  WordDelimiterFilter.cs:281)
- a token that yields nothing (all delimiters) leaves a position hole —
  the reference accumulates its increment into the next token
  (WordDelimiterFilter.cs:189,585-607)

Norm lengths count posIncr>=1 survivors only (discountOverlaps=true, like
the CommonGrams/CJK stages here).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import (
    DEFAULT_MAX_TOKEN_LENGTH,
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    tokenize_batch,
)

_WS_RE = re.compile(r"\S+")


def _char_cat(c: str) -> str:
    if c.isdigit():
        return "d"
    if c.isalpha():
        return "u" if c.isupper() else "l"
    return "x"


def split_subwords(
    token: str, *, split_on_case_change: bool = True, split_on_numerics: bool = True
) -> list[str]:
    """WordDelimiterIterator's boundary scan over one token."""
    cs = [_char_cat(c) for c in token]
    parts: list[str] = []
    start: int | None = None
    for i, c in enumerate(cs):
        if c == "x":
            if start is not None:
                parts.append(token[start:i])
                start = None
            continue
        if start is None:
            start = i
            continue
        p = cs[i - 1]
        boundary = False
        if split_on_case_change and p == "l" and c == "u":
            boundary = True
        elif split_on_case_change and p == "u" and c == "l" and i - 1 > start and cs[i - 2] == "u":
            # acronym run followed by lower: the run's last upper starts
            # the next word (USAToday -> USA|Today)
            parts.append(token[start : i - 1])
            start = i - 1
        if split_on_numerics and "d" in (p, c) and p != c and "x" not in (p, c) and not (
            {p, c} <= {"u", "l"}
        ):
            boundary = True
        if boundary:
            parts.append(token[start:i])
            start = i
    if start is not None:
        parts.append(token[start:])
    return parts


class WordDelimiterAnalyzer(StandardAnalyzer):
    """WhitespaceTokenizer + WordDelimiterFilter + LowerCase + Stop."""

    def __init__(
        self,
        *,
        generate_word_parts: bool = True,
        generate_number_parts: bool = True,
        split_on_case_change: bool = True,
        split_on_numerics: bool = True,
        stem_english_possessive: bool = True,
        catenate_words: bool = False,
        catenate_numbers: bool = False,
        catenate_all: bool = False,
        preserve_original: bool = False,
        stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ) -> None:
        super().__init__(
            stopwords=stopwords,
            max_token_length=max_token_length,
            lowercase=True,
            token_re=_WS_RE,
        )
        self.generate_word_parts = generate_word_parts
        self.generate_number_parts = generate_number_parts
        self.split_on_case_change = split_on_case_change
        self.split_on_numerics = split_on_numerics
        self.stem_english_possessive = stem_english_possessive
        self.catenate_words = catenate_words
        self.catenate_numbers = catenate_numbers
        self.catenate_all = catenate_all
        self.preserve_original = preserve_original

    def _expand(self, token: str) -> list[tuple[str, int]]:
        """(subterm, posIncrement) list for one raw whitespace token."""
        raw = token
        if self.stem_english_possessive and raw[-2:].lower() == "'s":
            raw = raw[:-2]
        parts = split_subwords(
            raw,
            split_on_case_change=self.split_on_case_change,
            split_on_numerics=self.split_on_numerics,
        )
        # single-subword fast path (WordDelimiterFilter.cs:281): a token
        # with no boundaries passes through unchanged regardless of the
        # generate flags — it is not "generated", it just survives.
        if parts == [raw] and raw == token:
            return [(token, 1)]

        out: list[tuple[str, int]] = []
        if self.preserve_original:
            out.append((token, 1))
        # the first parts-derived ADVANCING emission overlaps the
        # preserved original instead of opening a new position
        overlap_next = self.preserve_original

        def advance(sub: str) -> None:
            nonlocal overlap_next
            out.append((sub, 0 if overlap_next else 1))
            overlap_next = False

        # same-type runs for CATENATE_WORDS / CATENATE_NUMBERS
        runs: list[tuple[bool, list[str]]] = []
        for p in parts:
            d = p.isdigit()
            if runs and runs[-1][0] == d:
                runs[-1][1].append(p)
            else:
                runs.append((d, [p]))
        any_parts = False
        for is_digit, run in runs:
            gen = self.generate_number_parts if is_digit else self.generate_word_parts
            cat = self.catenate_numbers if is_digit else self.catenate_words
            if gen:
                advance(run[0])
                if cat and len(run) > 1:
                    # catenation overlaps the run's FIRST subword
                    out.append(("".join(run), 0))
                for p in run[1:]:
                    advance(p)
                any_parts = True
            elif cat:
                advance("".join(run))  # the run's sole emission
                any_parts = True
        if self.catenate_all and parts:
            joined = "".join(parts)
            first_idx = 1 if self.preserve_original else 0
            if any_parts and len(out) > first_idx:
                out.insert(first_idx + 1, (joined, 0))
            else:
                advance(joined)
        return out

    def tokenize_batch(self, texts: pd.Series):
        n_rows = len(pd.Series(texts))
        rows, terms, _, _ = tokenize_batch(
            pd.Series(texts),
            lowercase=False,
            stopwords=None,
            max_token_length=self.max_token_length,
            token_re=self.token_re,
        )
        cache: dict[str, list[tuple[str, int]]] = {}
        out_r: list[int] = []
        out_t: list[str] = []
        out_p: list[int] = []
        out_incr: list[int] = []
        cur_row = -1
        counter = -1
        for r, t in zip(rows.tolist(), terms.tolist()):
            if r != cur_row:
                cur_row, counter = r, -1
            exp = cache.get(t)
            if exp is None:
                exp = cache[t] = self._expand(t)
            if not exp:
                counter += 1  # vanished token: accumulated increment = hole
                continue
            for sub, incr in exp:
                counter += incr
                out_r.append(r)
                out_t.append(sub)
                out_p.append(counter)
                out_incr.append(incr)
        if not out_t:
            return (
                np.array([], dtype=np.int64),
                np.array([], dtype=object),
                np.array([], dtype=np.int32),
                np.zeros(n_rows, dtype=np.int32),
            )
        s = pd.Series(out_t, dtype=object).str.lower()
        keep = np.ones(len(s), dtype=bool)
        if self.stopwords:
            keep &= ~s.isin(self.stopwords).to_numpy()
        rows_a = np.asarray(out_r, dtype=np.int64)
        incr_a = np.asarray(out_incr, dtype=np.int64)
        field_lens = np.bincount(
            rows_a[keep & (incr_a >= 1)], minlength=n_rows
        ).astype(np.int32)
        return (
            rows_a[keep],
            s.to_numpy()[keep],
            np.asarray(out_p, dtype=np.int32)[keep],
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False
