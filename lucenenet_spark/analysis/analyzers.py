"""Analysis chain: StandardAnalyzer-equivalent tokenization, vectorized.

Reimplements the *semantics* of the reference analysis chain
(StandardTokenizer -> LowerCaseFilter -> StopFilter; see
src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardAnalyzer.cs:102-108)
as flat-numpy batch operations suitable for `mapInPandas` — no per-row Python
in the hot path (per-token work happens in C-level numpy/pandas kernels).

Parity contract implemented here:
- Tokenization: BMP subset of the UAX#29 word-break rules used by
  StandardTokenizer (reference JFlex DFA:
  src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardTokenizerImpl.cs).
  Alphanumeric runs (Latin/Greek/Cyrillic/Armenian/Hebrew/Arabic/
  Devanagari) optionally joined across a single `.` or `'` (UAX#29
  MidNumLet/MidLetter) or `_` (ExtendNumLet); Han ideographs and Hiragana
  one token per character; Katakana/Hangul script runs; Thai/Lao/Myanmar
  runs (no dictionary segmentation, as in the reference's standard
  tokenizer — ThaiAnalyzer layers it). Tokens longer than 255 chars are
  dropped (StandardAnalyzer.cs:52 DEFAULT_MAX_TOKEN_LENGTH). r5:
  supplementary-plane Han (CJK ext B-G) + selected astral ALetter ranges
  (math alphanumerics, Gothic, Deseret) are tokenized, and combining
  marks / ZWNJ/ZWJ (UAX#29 Extend/Format) extend the token in progress;
  astral scripts beyond those ranges remain a documented subset.
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

# UAX#29 word-break subset for the BMP, following the reference
# StandardTokenizer's emitted token types (JFlex grammar,
# Analysis/Standard/StandardTokenizerImpl.cs):
# - ALPHANUM: alphabetic/numeric runs (Latin + Greek/Cyrillic/Armenian/
#   Hebrew/Arabic/Devanagari here), joined across a single '.'/'\''
#   (MidNumLet/MidLetter) or '_' (ExtendNumLet);
# - IDEOGRAPHIC: ONE TOKEN PER Han character;
# - HIRAGANA: one token per character;
# - KATAKANA / HANGUL: script runs;
# - SOUTHEAST_ASIAN: Thai/Lao/Myanmar runs (no dictionary segmentation at
#   this layer — same as the reference, where ThaiAnalyzer adds it).
# Alternative order matters: runs first, single-char classes last.
_ALPHA_CLS = (
    "A-Za-z0-9_À-ɏ"
    "Ͱ-ϿЀ-ӿ԰-֏א-תؠ-ي"
    "٠-٩ऀ-ॿ"
    # supplementary-plane letters (UAX#29 ALetter outside the BMP --
    # documented subset): mathematical alphanumerics, Gothic, Deseret
    "\U0001D400-\U0001D7FF\U00010330-\U0001034A\U00010400-\U0001044F"
)
# UAX#29 Extend/Format: combining marks (and ZWNJ/ZWJ) never start a
# token but extend the one in progress -- the reference JFlex DFA folds
# them into the current token (StandardTokenizerImpl.cs Extend class).
# Covers combining diacriticals (+supplement/extended), Cyrillic, Hebrew
# points, Arabic harakat, general combining marks, half marks, ZWNJ/ZWJ.
_COMB_CLS = (
    "\u0300-\u036F\u0483-\u0489\u0591-\u05BD\u05BF\u05C1\u05C2\u05C4\u05C5\u05C7"
    "\u0610-\u061A\u064B-\u065F\u0670\u1AB0-\u1AFF\u1DC0-\u1DFF"
    "\u20D0-\u20F0\uFE20-\uFE2F\u200C\u200D"
)
# Han: BMP blocks + supplementary ideographic planes (CJK ext B-G +
# compatibility supplement) -- one token per character either way
_HAN_CLS = (
    "⺀-⻿㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002A6DF\U0002A700-\U0002EBEF"
    "\U0002F800-\U0002FA1F\U00030000-\U0003134A"
)
_HIRAGANA_CLS = "ぁ-ゖゝ-ゟ"
_KATAKANA_CLS = "ァ-ヺー-ヿㇰ-ㇿ"
_HANGUL_CLS = "ᄀ-ᇿ㄰-㆏가-힯"
_SEASIAN_CLS = "ก-ฺเ-๛ກ-ຽເ-ໍက-ဿ"
_ALPHA_BODY = f"[{_ALPHA_CLS}][{_ALPHA_CLS}{_COMB_CLS}]*"
_TOKEN_RE = re.compile(
    f"{_ALPHA_BODY}(?:[.']{_ALPHA_BODY})*"
    f"|[{_KATAKANA_CLS}][{_KATAKANA_CLS}{_COMB_CLS}]*"
    f"|[{_HANGUL_CLS}][{_HANGUL_CLS}{_COMB_CLS}]*"
    f"|[{_SEASIAN_CLS}]+"
    f"|[{_HAN_CLS}][{_COMB_CLS}]*"
    f"|[{_HIRAGANA_CLS}][{_COMB_CLS}]*"
)

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


def tokenize_batch_arrow(
    texts,
    *,
    lowercase: bool = True,
    stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    token_re: re.Pattern = _TOKEN_RE,
):
    """Arrow-native tokenization: identical output contract to
    ``tokenize_batch`` but terms stay in Arrow C++ (re2 split, utf8_lower,
    dictionary_encode) — zero per-token Python string objects on the fast
    path. Returns ``(row_idx, codes, dictionary, positions, field_lens)``
    where ``dictionary.take(codes)`` is the term stream.

    Parity strategy: the text is split on the token-alphabet complement;
    candidates that fully match the token regex (the overwhelming majority)
    are used as-is, the rest (e.g. ``a..b``, ``'x``, trailing ``.``) fall
    back to python findall per candidate so the emitted token stream is
    byte-identical to the reference path (verified by differential test).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    # fast path covers Latin candidates (the anchored check); any candidate
    # touching the wider script classes fails it and takes the python
    # findall surgery with the FULL token regex — correctness for CJK/etc.
    # at python speed, zero cost for all-Latin corpora
    alphabet = "A-Za-z0-9_À-ɏ"
    keep = (
        alphabet + _ALPHA_CLS + _HAN_CLS + _HIRAGANA_CLS
        + _KATAKANA_CLS + _HANGUL_CLS + _SEASIAN_CLS + _COMB_CLS
    )
    delim = f"[^{keep}.']+"
    anchored = f"^(?:[{alphabet}]+(?:[.'][{alphabet}]+)*)$"

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        pd.Series(texts).fillna("").astype(str), type=pa.string()
    )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.fill_null("")
    n_rows = len(arr)

    cand_list = pc.split_pattern_regex(arr, pattern=delim)
    flat = cand_list.flatten()
    cand_counts = pc.list_value_length(cand_list).to_numpy(zero_copy_only=False)
    cand_row = np.repeat(np.arange(n_rows, dtype=np.int64), cand_counts)

    nonempty = pc.not_equal(flat, "")
    valid = pc.match_substring_regex(flat, anchored)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    ok_np = valid.to_numpy(zero_copy_only=False) & ne_np

    if bool(np.all(ok_np == ne_np)):
        # fast path: every nonempty candidate IS exactly one token
        keep = np.flatnonzero(ne_np)
        tokens = flat.take(pa.array(keep, type=pa.int64()))
        tok_row = cand_row[keep]
    else:
        # surgery: expand irregular candidates with python findall
        irregular = np.flatnonzero(ne_np & ~ok_np)
        irr_set = set(irregular.tolist())
        tokens_parts: list = []
        rows_parts: list = []
        regular = np.flatnonzero(ok_np)
        # counts per candidate to preserve order: walk candidates in order
        irr_tokens = {
            int(i): token_re.findall(flat[int(i)].as_py()) for i in irregular
        }
        order_tokens = []
        order_rows = []
        for i in np.flatnonzero(ne_np):
            i = int(i)
            if i in irr_set:
                for t in irr_tokens[i]:
                    order_tokens.append(t)
                    order_rows.append(cand_row[i])
            else:
                order_tokens.append(None)  # placeholder for arrow value
                order_rows.append(cand_row[i])
        # fill placeholders from arrow without converting regulars
        reg_iter = iter(flat.take(pa.array(regular, type=pa.int64())).to_pylist())
        order_tokens = [t if t is not None else next(reg_iter) for t in order_tokens]
        tokens = pa.array(order_tokens, type=pa.string())
        tok_row = np.asarray(order_rows, dtype=np.int64)

    total = len(tokens)
    if total == 0:
        return (
            np.array([], dtype=np.int64),
            np.array([], dtype=np.int64),
            pa.array([], type=pa.string()),
            np.array([], dtype=np.int32),
            np.zeros(n_rows, dtype=np.int32),
        )

    # raw position = token index within its document (pre-filter, holes kept)
    tok_counts = np.bincount(tok_row, minlength=n_rows)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(tok_counts[:-1], out=offsets[1:])
    positions = (np.arange(total, dtype=np.int64) - offsets[tok_row]).astype(np.int32)

    if lowercase:
        tokens = pc.utf8_lower(tokens)
    keep_mask = pc.less_equal(pc.utf8_length(tokens), max_token_length)
    if stopwords:
        not_stop = pc.invert(
            pc.is_in(tokens, value_set=pa.array(sorted(stopwords), type=pa.string()))
        )
        keep_mask = pc.and_(keep_mask, not_stop)
    keep_np = keep_mask.to_numpy(zero_copy_only=False)
    keep_idx = np.flatnonzero(keep_np)

    kept_tokens = tokens.take(pa.array(keep_idx, type=pa.int64()))
    kept_rows = tok_row[keep_idx]
    kept_pos = positions[keep_idx]
    field_lens = np.bincount(kept_rows, minlength=n_rows).astype(np.int32)

    enc = pc.dictionary_encode(kept_tokens)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary
    return kept_rows, codes, dictionary, kept_pos, field_lens


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

    def tokenize_batch_arrow(self, texts):
        """Arrow-native variant (see tokenize_batch_arrow); only valid for
        the standard token regex — custom regexes use the pandas path."""
        return tokenize_batch_arrow(
            texts,
            lowercase=self.lowercase,
            stopwords=self.stopwords,
            max_token_length=self.max_token_length,
            token_re=self.token_re,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return self.token_re is _TOKEN_RE

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


class EnglishAnalyzer(StandardAnalyzer):
    """StandardTokenizer + EnglishPossessiveFilter + LowerCase + Stop +
    PorterStemFilter (reference Analysis/En/EnglishAnalyzer.cs:115;
    PorterStemmer.cs). Stemming runs over the batch's term DICTIONARY
    (unique tokens), not per token — the vectorized equivalent of the
    per-token filter chain.

    ``stem_exclusions`` is the SetKeywordMarkerFilter seam
    (Analysis/Miscellaneous/SetKeywordMarkerFilter.cs, wired by
    EnglishAnalyzer.cs's stemExclusionSet ctor arg): matching tokens pass
    the stemmer untouched. ``stem_overrides`` is the
    StemmerOverrideFilter seam
    (Analysis/Miscellaneous/StemmerOverrideFilter.cs): matching tokens
    are replaced by the dictionary value INSTEAD of being stemmed. Both
    match the lowercased token, like the reference chains (the marker
    filters sit after LowerCaseFilter); overrides win over exclusions,
    mirroring StemmerOverrideFilter setting keywordAtt so later stemmers
    skip the token.

    Note: the engine's StandardTokenizer subset splits on apostrophes, so
    possessive 's never reaches the filter as a suffix on this corpus
    alphabet; strip_possessive is applied defensively for custom regexes.
    """

    def __init__(
        self,
        stopwords: frozenset[str] | None = ENGLISH_STOP_WORDS,
        max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
        stem_exclusions: frozenset[str] | None = None,
        stem_overrides: dict[str, str] | None = None,
    ) -> None:
        super().__init__(
            stopwords=stopwords, max_token_length=max_token_length, lowercase=True
        )
        self.stem_exclusions = stem_exclusions
        self.stem_overrides = stem_overrides

    def _stem_one(self, tok: str) -> str:
        from lucenenet_spark.analysis.porter import porter_stem, strip_possessive

        t = strip_possessive(tok)
        if self.stem_overrides is not None and t in self.stem_overrides:
            return self.stem_overrides[t]
        if self.stem_exclusions is not None and t in self.stem_exclusions:
            return t
        return porter_stem(t)

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        if len(terms):
            # stem unique tokens once, then map back (vocab << tokens)
            codes, uniques = pd.factorize(pd.Series(terms), sort=False)
            stemmed = np.array([self._stem_one(u) for u in uniques], dtype=object)
            terms = stemmed[codes]
        return row_idx, terms, positions, field_lens

    def tokenize_batch_arrow(self, texts):
        import pyarrow as pa

        row_idx, codes, dictionary, positions, field_lens = super().tokenize_batch_arrow(
            texts
        )
        if len(dictionary):
            stemmed = pa.array(
                [self._stem_one(u) for u in dictionary.to_pylist()], type=pa.string()
            )
            dictionary = stemmed
        return row_idx, codes, dictionary, positions, field_lens


def fold_ascii_series(s: "pd.Series") -> "pd.Series":
    """ASCIIFoldingFilter core (Analysis/Miscellaneous/ASCIIFoldingFilter.cs):
    fold accented/decorated Latin characters to their ASCII equivalents.
    Vectorized via NFKD decomposition + combining-mark strip (covers the
    Latin-1/Latin-Extended bulk of the reference's mapping table; the
    reference's few non-decomposition mappings, e.g. ae ligatures, are
    handled explicitly)."""
    lig = {ord("æ"): "ae", ord("Æ"): "AE", ord("œ"): "oe", ord("Œ"): "OE",
           ord("ß"): "ss", ord("ø"): "o", ord("Ø"): "O", ord("đ"): "d",
           ord("Đ"): "D", ord("þ"): "th", ord("Þ"): "TH", ord("ð"): "d",
           ord("Ð"): "D", ord("ł"): "l", ord("Ł"): "L"}
    out = s.map(lambda x: x.translate(lig) if isinstance(x, str) else x)
    return (
        out.str.normalize("NFKD")
        .str.encode("ascii", "ignore")
        .str.decode("ascii")
    )


class FoldingAnalyzer(StandardAnalyzer):
    """StandardAnalyzer + ASCIIFoldingFilter applied to the emitted terms
    (dictionary-level fold — unique tokens only, like EnglishAnalyzer's
    stemming stage)."""

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        if len(terms):
            codes, uniques = pd.factorize(pd.Series(terms), sort=False)
            folded = fold_ascii_series(pd.Series(uniques)).to_numpy(dtype=object)
            terms = folded[codes]
        return row_idx, terms, positions, field_lens

    def tokenize_batch_arrow(self, texts):
        import pyarrow as pa

        row_idx, codes, dictionary, positions, field_lens = super().tokenize_batch_arrow(texts)
        if len(dictionary):
            folded = fold_ascii_series(pd.Series(dictionary.to_pylist()))
            dictionary = pa.array(folded.tolist(), type=pa.string())
        return row_idx, codes, dictionary, positions, field_lens


# ---------------------------------------------------------------------------
# UAX29URLEmailTokenizer subset (Analysis/Standard/UAX29URLEmailTokenizer.cs):
# URLs and e-mail addresses survive as SINGLE tokens; everything else follows
# the standard word-break rules. Subset scope (documented): scheme://... and
# www.-prefixed URLs over the RFC-3986 unreserved/reserved ASCII alphabet,
# and local@domain.tld e-mails — the web-corpus 99% case; IDN hosts, IPv6
# literals, and bare-domain URLs fall back to standard tokenization.
# Alternation order matters: URL before EMAIL before the standard token, so
# the scheme's "https" never splits off.
# ---------------------------------------------------------------------------
_URL_EMAIL_RE = re.compile(
    r"(?:https?|ftp)://[A-Za-z0-9._~:/?#@!$&'()*+,;=%\-\[\]]+"
    r"|www\.[A-Za-z0-9._~:/?#@!$&'()*+,;=%\-\[\]]+"
    r"|[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
    r"|" + _TOKEN_RE.pattern
)


class UAX29URLEmailAnalyzer(StandardAnalyzer):
    """StandardAnalyzer with the URL/e-mail-preserving tokenizer (the
    UAX29URLEmailAnalyzer composition of the reference). Uses the pandas
    tokenize path (custom regex disables the Arrow fast path)."""

    def __init__(self, **kw) -> None:
        kw.setdefault("token_re", _URL_EMAIL_RE)
        super().__init__(**kw)


class MappingAnalyzer(StandardAnalyzer):
    """MappingCharFilter subset (Analysis/CharFilter/MappingCharFilter.cs)
    in front of the standard chain: literal string replacements applied to
    the RAW text before tokenization, longest mapping key first. Subset
    scope: replacements run sequentially per key (longest first) rather
    than through the reference's simultaneous NormalizeCharMap FST — for
    non-overlapping mapping keys (the typical normalization table) the
    output is identical."""

    def __init__(self, mappings: dict[str, str], **kw) -> None:
        super().__init__(**kw)
        self.mappings = dict(
            sorted(mappings.items(), key=lambda kv: (-len(kv[0]), kv[0]))
        )

    def _map(self, texts: pd.Series) -> pd.Series:
        s = pd.Series(texts).fillna("").astype(str)
        for k, v in self.mappings.items():
            s = s.str.replace(k, v, regex=False)
        return s

    def tokenize_batch(self, texts: pd.Series):
        return super().tokenize_batch(self._map(texts))

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


class PatternReplaceAnalyzer(StandardAnalyzer):
    """PatternReplaceCharFilter (Analysis/Pattern/PatternReplaceCharFilter.cs)
    in front of the standard chain: a regex substitution applied to the RAW
    text before tokenization (the reference rewrites the char stream and
    corrects offsets; we tokenize the rewritten text — same tokens, and the
    row store keeps the original for offset-based consumers)."""

    def __init__(self, pattern: str, replacement: str, **kw) -> None:
        super().__init__(**kw)
        self.pattern = pattern
        self.replacement = replacement

    def _map(self, texts: pd.Series) -> pd.Series:
        s = pd.Series(texts).fillna("").astype(str)
        return s.str.replace(self.pattern, self.replacement, regex=True)

    def tokenize_batch(self, texts: pd.Series):
        return super().tokenize_batch(self._map(texts))

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


class EdgeNGramAnalyzer(StandardAnalyzer):
    """Standard chain + EdgeNGramTokenFilter
    (Analysis.Common/Analysis/NGram/EdgeNGramTokenFilter.cs, 4.4+
    behavior): each emitted token expands to its leading n-grams of
    lengths [min_gram, min(max_gram, len)], ALL at the token's position
    (first gram posIncr=1, rest posIncr=0). Norm length counts each
    source token once (discountOverlaps=true drops the posIncr=0 grams),
    and only tokens long enough to emit at least one gram count —
    tokens shorter than min_gram vanish, as in the reference filter.
    The canonical typeahead-indexing stage: a prefix query becomes an
    exact term lookup on the gram dictionary."""

    def __init__(self, min_gram: int = 2, max_gram: int = 5, **kw) -> None:
        super().__init__(**kw)
        assert 1 <= min_gram <= max_gram
        self.min_gram = min_gram
        self.max_gram = max_gram

    def _expand(self, token: str) -> list[str]:
        lo, hi = self.min_gram, min(self.max_gram, len(token))
        return [token[:n] for n in range(lo, hi + 1)]

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, _ = super().tokenize_batch(texts)
        n_rows = len(pd.Series(texts))
        out_t: list[str] = []
        out_r: list[int] = []
        out_p: list[int] = []
        src_rows: list[int] = []
        for r, t, p in zip(row_idx.tolist(), terms.tolist(), positions.tolist()):
            grams = self._expand(t)
            if grams:
                src_rows.append(r)
                out_t.extend(grams)
                out_r.extend([r] * len(grams))
                out_p.extend([p] * len(grams))
        field_lens = np.bincount(
            np.asarray(src_rows, dtype=np.int64), minlength=n_rows
        ).astype(np.int32)
        return (
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_t, dtype=object),
            np.asarray(out_p, dtype=np.int32),
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


class NGramAnalyzer(EdgeNGramAnalyzer):
    """Standard chain + NGramTokenFilter (NGram/NGramTokenFilter.cs):
    ALL substrings of lengths [min_gram, max_gram] per token, same
    position — the substring-search indexing primitive."""

    def _expand(self, token: str) -> list[str]:
        lo, hi = self.min_gram, min(self.max_gram, len(token))
        out = []
        for n in range(lo, hi + 1):
            out.extend(token[i : i + n] for i in range(len(token) - n + 1))
        return out


class CommonGramsAnalyzer(StandardAnalyzer):
    """Standard chain + CommonGramsFilter
    (Analysis.Common/Analysis/CommonGrams/CommonGramsFilter.cs): keeps ALL
    unigrams (no stop removal — common words stay searchable) and, for
    every adjacent pair where either side is a common word, additionally
    emits the bigram token "w1_w2" at w1's position (posIncrement 0).
    Norm length counts unigrams only (discountOverlaps drops the
    posIncr=0 grams). The point is stopword-phrase latency: a phrase like
    "the merge" becomes ONE gram-term lookup instead of a position join
    against the corpus-wide 'the' posting list."""

    GRAM_SEP = "_"

    def __init__(self, common_words: frozenset[str] | None = None, **kw) -> None:
        kw.setdefault("stopwords", None)  # unigrams all survive
        super().__init__(**kw)
        self.common_words = (
            common_words if common_words is not None else ENGLISH_STOP_WORDS
        )

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        if not len(terms):
            return row_idx, terms, positions, field_lens
        out_r = row_idx.tolist()
        out_t = terms.tolist()
        out_p = positions.tolist()
        common = self.common_words
        sep = self.GRAM_SEP
        r, t, p = row_idx.tolist(), terms.tolist(), positions.tolist()
        for i in range(len(t) - 1):
            # adjacent = same row, consecutive positions (the raw stream
            # has no holes here because nothing was filtered out)
            if r[i] == r[i + 1] and p[i + 1] == p[i] + 1 and (
                t[i] in common or t[i + 1] in common
            ):
                out_r.append(r[i])
                out_t.append(t[i] + sep + t[i + 1])
                out_p.append(p[i])
        order = np.lexsort((np.asarray(out_p), np.asarray(out_r)))
        return (
            np.asarray(out_r, dtype=np.int64)[order],
            np.asarray(out_t, dtype=object)[order],
            np.asarray(out_p, dtype=np.int32)[order],
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False

    def query_terms(self, text: str) -> list[tuple[str, int]]:
        """CommonGramsQueryFilter (CommonGramsQueryFilter.cs): phrase
        terms where every common-adjacent pair is replaced by its gram and
        the absorbed unigrams are dropped — "the merge" -> [the_merge@0],
        "big the merge" -> [big_the@0, the_merge@1]."""
        # raw unigram stream (NOT self.tokenize_batch — that emits grams)
        _, terms, positions, _ = StandardAnalyzer.tokenize_batch(
            self, pd.Series([text])
        )
        toks = list(zip(terms.tolist(), positions.tolist()))
        n = len(toks)
        common = self.common_words
        out: list[tuple[str, int]] = []
        for i, (w, p) in enumerate(toks):
            gram_prev = i > 0 and (toks[i - 1][0] in common or w in common)
            gram_next = i < n - 1 and (w in common or toks[i + 1][0] in common)
            if gram_next:
                out.append((w + self.GRAM_SEP + toks[i + 1][0], p))
            if not gram_prev and not gram_next:
                out.append((w, p))
        return out


class CharNGramAnalyzer(StandardAnalyzer):
    """NGramTokenizer analogue (Analysis.Common/Analysis/NGram/
    NGramTokenizer.cs, fixed n): each surface token explodes into its
    character n-grams at CONSECUTIVE positions (position counter
    accumulates across the document), the layout NGramPhraseQuery's
    every-n-th-gram thinning requires — the CJK-style substring-search
    index. Tokens shorter than n vanish. Norm length counts emitted grams
    (each gram is posIncr=1 here, unlike the same-position NGramAnalyzer
    filter)."""

    def __init__(self, n: int = 2, **kw) -> None:
        kw.setdefault("stopwords", None)
        super().__init__(**kw)
        assert n >= 1
        self.n = n

    def grams(self, token: str) -> list[str]:
        n = self.n
        return [token[i : i + n] for i in range(len(token) - n + 1)]

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, _ = super().tokenize_batch(texts)
        n_rows = len(pd.Series(texts))
        out_r: list[int] = []
        out_t: list[str] = []
        out_p: list[int] = []
        next_pos: dict[int, int] = {}
        for r, t in zip(row_idx.tolist(), terms.tolist()):
            gs = self.grams(t)
            if not gs:
                continue
            p0 = next_pos.get(r, 0)
            out_r.extend([r] * len(gs))
            out_t.extend(gs)
            out_p.extend(range(p0, p0 + len(gs)))
            # +1 gap between source tokens so a phrase can never span two
            # tokens' gram runs
            next_pos[r] = p0 + len(gs) + 1
        field_lens = np.bincount(
            np.asarray(out_r, dtype=np.int64), minlength=n_rows
        ).astype(np.int32)
        return (
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_t, dtype=object),
            np.asarray(out_p, dtype=np.int32),
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


class CompoundWordAnalyzer(StandardAnalyzer):
    """Standard chain + DictionaryCompoundWordTokenFilter
    (Analysis.Common/Analysis/Compound/DictionaryCompoundWordTokenFilter.cs
    + CompoundWordTokenFilterBase.cs): tokens of at least `min_word_size`
    chars are brute-force decomposed — every dictionary word of length
    [min_subword_size, max_subword_size] found at any offset is emitted as
    an extra token AT THE ORIGINAL TOKEN'S POSITION (posIncrement 0); with
    only_longest_match, just the longest hit per start offset. The
    original token is always kept. Norm length counts source tokens once
    (the posIncr=0 subwords are discounted, as with the gram filters)."""

    def __init__(self, dictionary: frozenset[str],
                 min_word_size: int = 5, min_subword_size: int = 2,
                 max_subword_size: int = 15,
                 only_longest_match: bool = False, **kw) -> None:
        super().__init__(**kw)
        self.dictionary = frozenset(w.lower() for w in dictionary)
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        self.only_longest_match = only_longest_match

    def decompose(self, token: str) -> list[str]:
        n = len(token)
        if n < self.min_word_size:
            return []
        out: list[str] = []
        for i in range(n - self.min_subword_size + 1):
            longest = None
            for L in range(self.min_subword_size,
                           min(self.max_subword_size, n - i) + 1):
                part = token[i : i + L]
                if part in self.dictionary:
                    if self.only_longest_match:
                        longest = part
                    else:
                        out.append(part)
            if longest is not None:
                out.append(longest)
        return out

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        if not len(terms):
            return row_idx, terms, positions, field_lens
        out_r = row_idx.tolist()
        out_t = terms.tolist()
        out_p = positions.tolist()
        for r, t, p in zip(row_idx.tolist(), terms.tolist(), positions.tolist()):
            for sub in self.decompose(t):
                out_r.append(r)
                out_t.append(sub)
                out_p.append(p)
        order = np.lexsort((np.asarray(out_p), np.asarray(out_r)))
        return (
            np.asarray(out_r, dtype=np.int64)[order],
            np.asarray(out_t, dtype=object)[order],
            np.asarray(out_p, dtype=np.int32)[order],
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


_CJK_SINGLE_RE = re.compile(f"[{_HAN_CLS}{_HIRAGANA_CLS}]")


class CJKAnalyzer(StandardAnalyzer):
    """CJKAnalyzer analogue (Analysis/Cjk/CJKAnalyzer.cs =
    StandardTokenizer + CJKBigramFilter.cs): runs of adjacent single-char
    CJK tokens (the Han/Hiragana classes our tokenizer emits per-char)
    become OVERLAPPING BIGRAMS — '我是中国人' -> 我是 是中 中国 国人, each
    at its first char's position; an isolated CJK char stays a unigram
    (CJKBigramFilter's lone-character case), and non-CJK tokens pass
    through untouched. output_unigrams=True additionally keeps the
    single-char tokens (the filter's outputUnigrams flag). Norm length
    follows the reference's default discountOverlaps=true: in
    output_unigrams mode the bigrams ride at posIncr=0 over the unigrams,
    so field_lens counts ONLY the unigrams (+ non-CJK tokens) — same rule
    CommonGramsAnalyzer applies to its overlap grams; with
    output_unigrams=False the bigrams are the primary (posIncr>=1) tokens
    and count normally."""

    def __init__(self, output_unigrams: bool = False, **kw) -> None:
        super().__init__(**kw)
        self.output_unigrams = output_unigrams

    @staticmethod
    def _is_cjk(tok: str) -> bool:
        return len(tok) == 1 and bool(_CJK_SINGLE_RE.fullmatch(tok))

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, _ = super().tokenize_batch(texts)
        n_rows = len(pd.Series(texts))
        out_r: list[int] = []
        out_t: list[str] = []
        out_p: list[int] = []
        overlap_r: list[int] = []
        r = row_idx.tolist()
        t = terms.tolist()
        p = positions.tolist()
        n = len(t)
        i = 0
        while i < n:
            if not self._is_cjk(t[i]):
                out_r.append(r[i]); out_t.append(t[i]); out_p.append(p[i])
                i += 1
                continue
            # extend the run of adjacent-position CJK singles in this row
            j = i + 1
            while (
                j < n and r[j] == r[i] and p[j] == p[j - 1] + 1
                and self._is_cjk(t[j])
            ):
                j += 1
            if j - i == 1 or self.output_unigrams:
                for k in range(i, j):
                    out_r.append(r[k]); out_t.append(t[k]); out_p.append(p[k])
            if j - i >= 2:
                for k in range(i, j - 1):
                    out_r.append(r[k])
                    out_t.append(t[k] + t[k + 1])
                    out_p.append(p[k])
                    if self.output_unigrams:
                        # posIncr=0 overlap over the unigram at p[k]:
                        # excluded from norms (discountOverlaps=true)
                        overlap_r.append(r[k])
            i = j
        order = np.lexsort((np.asarray(out_p), np.asarray(out_r)))
        field_lens = (
            np.bincount(np.asarray(out_r, dtype=np.int64), minlength=n_rows)
            - np.bincount(np.asarray(overlap_r, dtype=np.int64), minlength=n_rows)
        ).astype(np.int32)
        return (
            np.asarray(out_r, dtype=np.int64)[order],
            np.asarray(out_t, dtype=object)[order],
            np.asarray(out_p, dtype=np.int32)[order],
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


# ---------------------------------------------------------------------------
# Japanese (Kuromoji-class) analysis
# ---------------------------------------------------------------------------
# Hiragana function words (particles, auxiliaries, light verbs) dropped by
# the reference's JapaneseAnalyzer via part-of-speech stop tags
# (Lucene.Net.Analysis.Kuromoji/JapaneseAnalyzer.cs stop set + stoptags);
# this subset covers the high-frequency closed-class forms.
JAPANESE_STOP_WORDS = frozenset(
    """の に は を た が で て と し れ さ ある いる も する から な こと
    として い や など なっ ない この ため その あっ よう また もの という
    あり まで られ なる へ か だ これ によって により おり より による ず
    なり られる において ば なかっ なく しかし について せ だっ その後
    できる それ う ので なお のみ でき き つ における および いう さらに
    でも ら たり その他 に関する たち ます ん なら に対して 特に せる 及び
    これら とき では にて ほか ながら うち そして とともに ただし かつて
    それぞれ または に対する ほとんど と共に といった です とも ところ ここ""".split()
)


class JapaneseAnalyzer(StandardAnalyzer):
    """Kuromoji-class Japanese analysis as a DOCUMENTED dictionary/bigram
    hybrid (reference: Lucene.Net.Analysis.Kuromoji/JapaneseAnalyzer.cs,
    JapaneseTokenizer.cs). A faithful Viterbi lattice over the MeCab
    IPADIC cost model is out of scope in this sandbox (the dictionary
    binary is not shippable); instead:

    - runs of adjacent single-char CJK tokens (the Han/Hiragana classes
      the UAX#29 subset tokenizer emits per-char) are segmented by GREEDY
      LONGEST MATCH against a user dictionary — the same mechanism as
      JapaneseTokenizer's user-dictionary overrides, which take priority
      over the lattice in the reference;
    - unmatched spans fall back to overlapping bigrams (an isolated
      unmatched char stays a unigram) — Kuromoji's SEARCH-mode behaviour
      of emitting n-grammed fragments for long unknown runs, and exactly
      CJKAnalyzer's recall-preserving fallback;
    - hiragana function words are dropped via JAPANESE_STOP_WORDS, the
      analogue of JapaneseAnalyzer's POS stop tags + stop set;
    - Katakana runs arrive as whole tokens from the tokenizer (loanwords
      keep their natural segmentation).

    Positions are TOKEN-STREAM indices (one per emitted token, like
    JapaneseTokenizer's posIncr=1 stream, not char offsets): consecutive
    dictionary words get consecutive positions, so PhraseQuery over them
    matches adjacent text; dropped particles leave position holes
    (StopFilter posIncr accumulation). Norm lengths count emitted tokens
    post-stop-filter (FieldInvertState; the fallback bigrams are primary
    tokens, not posIncr=0 overlays)."""

    def __init__(self, user_dict=(), stopwords=JAPANESE_STOP_WORDS, **kw) -> None:
        # The base tokenizer must NOT stop-filter: dropping a particle
        # before run grouping would split a CJK run mid-dictionary-word.
        # The ja stop set applies post-segmentation (like the reference,
        # where the POS stop filter runs after JapaneseTokenizer).
        kw.setdefault("stopwords", None)
        super().__init__(**kw)
        self.ja_stopwords = frozenset(stopwords or ())
        self.user_dict = frozenset(user_dict)
        self._max_word = max((len(w) for w in self.user_dict), default=0)

    @staticmethod
    def _is_cjk(tok: str) -> bool:
        return len(tok) == 1 and bool(_CJK_SINGLE_RE.fullmatch(tok))

    def _segment(self, run: str) -> list[str]:
        """Greedy longest dictionary match; unmatched spans -> overlapping
        bigrams (isolated unmatched char -> unigram). Returns the token
        sequence in surface order."""
        out: list[str] = []
        n = len(run)
        i = 0
        unk_start = -1

        def flush_unknown(lo: int, hi: int) -> None:
            if lo < 0:
                return
            span = hi - lo
            if span == 1:
                out.append(run[lo])
            else:
                for k in range(lo, hi - 1):
                    out.append(run[k : k + 2])

        while i < n:
            best = None
            for L in range(min(self._max_word, n - i), 0, -1):
                if run[i : i + L] in self.user_dict:
                    best = run[i : i + L]
                    break
            if best is not None:
                flush_unknown(unk_start, i)
                unk_start = -1
                out.append(best)
                i += len(best)
            else:
                if unk_start < 0:
                    unk_start = i
                i += 1
        flush_unknown(unk_start, n if unk_start >= 0 else -1)
        return out

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, _ = super().tokenize_batch(texts)
        n_rows = len(pd.Series(texts))
        out_r: list[int] = []
        out_t: list[str] = []
        out_p: list[int] = []
        r = row_idx.tolist()
        t = terms.tolist()
        p = positions.tolist()
        n = len(t)
        i = 0
        cur_row = -1
        counter = 0  # token-stream position within the current row
        while i < n:
            if r[i] != cur_row:
                cur_row = r[i]
                counter = 0
            if not self._is_cjk(t[i]):
                out_r.append(r[i]); out_t.append(t[i]); out_p.append(counter)
                counter += 1
                i += 1
                continue
            j = i + 1
            while (
                j < n and r[j] == r[i] and p[j] == p[j - 1] + 1
                and self._is_cjk(t[j])
            ):
                j += 1
            run = "".join(t[i:j])
            for term in self._segment(run):
                if term in self.ja_stopwords:
                    counter += 1  # stop token leaves a position hole
                    continue
                out_r.append(r[i]); out_t.append(term); out_p.append(counter)
                counter += 1
            i = j
        order = np.lexsort((np.asarray(out_p), np.asarray(out_r)))
        field_lens = np.bincount(
            np.asarray(out_r, dtype=np.int64), minlength=n_rows
        ).astype(np.int32)
        return (
            np.asarray(out_r, dtype=np.int64)[order],
            np.asarray(out_t, dtype=object)[order],
            np.asarray(out_p, dtype=np.int32)[order],
            field_lens,
        )

    @property
    def supports_arrow_fast_path(self) -> bool:
        return False


# ---------------------------------------------------------------------------
# Chinese (SmartCn-class) analysis
# ---------------------------------------------------------------------------
# High-frequency Chinese function words + CJK punctuation, the documented
# subset of the reference's stopwords resource
# (Lucene.Net.Analysis.SmartCn/SmartChineseAnalyzer.cs DefaultStopSet).
SMARTCN_STOP_WORDS = frozenset(
    """的 了 是 在 和 有 我 他 这 就 不 人 都 一 也 很 到 说 要 去 你
    会 着 没有 看 好 自己 吗 呢 吧 啊 把 被 让 向 往 但 而 且 或 因为
    所以 如果 虽然 对于 关于 以及 并且 或者 之 与 及 于 其 中
    ， 。 、 ； ： ？ ！ “ ” ‘ ’ （ ） 《 》 …… — ·""".split()
)


class SmartChineseAnalyzer(JapaneseAnalyzer):
    """SmartCn-class Chinese analysis as the same DOCUMENTED
    dictionary/bigram hybrid the Japanese analyzer uses (reference:
    Lucene.Net.Analysis.SmartCn/SmartChineseAnalyzer.cs:49,156-166 —
    SentenceTokenizer → WordTokenFilter → PorterStemFilter → StopFilter).
    The reference's WordTokenFilter segments Han runs with an HMM over
    shipped word/bigram frequency dictionaries (.mem resources, not
    shippable here); the documented substitution is the greedy
    user-dictionary longest match with overlapping-bigram fallback —
    exactly the recall-preserving path SmartCn itself degrades to for
    out-of-vocabulary runs.

    What is faithfully SmartCn (vs the JA parent):
    - embedded Latin tokens are PORTER-STEMMED (the reference pipes the
      whole stream through PorterStemFilter; only Latin tokens change
      under it, as in the reference where Han tokens are untouched);
    - the stop set is the Chinese function-word/punctuation table
      (the reference's StopFilter sits last; the table is disjoint from
      Latin tokens so running it inside segmentation is extensionally
      identical), leaving position holes."""

    def __init__(self, user_dict=(), stopwords=SMARTCN_STOP_WORDS, **kw) -> None:
        super().__init__(user_dict=user_dict, stopwords=stopwords, **kw)

    def tokenize_batch(self, texts: pd.Series):
        from lucenenet_spark.analysis.porter import porter_stem

        row_idx, terms, positions, field_lens = super().tokenize_batch(texts)
        stemmed = np.asarray(
            [porter_stem(t) if t.isascii() and t.isalpha() else t for t in terms.tolist()],
            dtype=object,
        )
        return row_idx, stemmed, positions, field_lens
