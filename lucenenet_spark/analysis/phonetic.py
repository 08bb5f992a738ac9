"""Phonetic encoders + PhoneticAnalyzer — the
`Lucene.Net.Analysis.Phonetic` module analogue (PhoneticFilter.cs wraps
commons-codec encoders; these are the published algorithms
re-implemented from their specifications):

- soundex: classic American Soundex (Odell & Russell; the commons-codec
  ``Soundex.US_ENGLISH`` variant with the H/W-transparency rule).
- refined_soundex: commons-codec RefinedSoundex (unbounded length,
  9-class code table, vowels emit '0' on transition).
- cologne_phonetic: Postel's Koelner Phonetik (1969) for German-language
  names — context-sensitive code table, duplicate collapse, interior
  '0' removal.

PhoneticAnalyzer mirrors PhoneticFilter's two modes:
- inject=False: each token is REPLACED by its phonetic key (the
  _SnowballAnalyzer unique-term dictionary pattern — O(|vocab|) Python).
- inject=True: the key is emitted ALONGSIDE the original at the same
  position (posIncrement 0, the CommonGramsAnalyzer overlap pattern);
  norms count originals only (discountOverlaps).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.analysis.snowball import _SnowballAnalyzer

# --------------------------------------------------------------- Soundex
_SOUNDEX_CODE = {}
for _letters, _d in (
    ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6"),
):
    for _c in _letters:
        _SOUNDEX_CODE[_c] = _d


def soundex(word: str) -> str:
    """Classic 4-char Soundex (PhoneticFilter.cs + commons-codec
    Soundex): first letter + up to 3 consonant-class digits; vowels
    reset the repeat-collapse, h/w are transparent (Ashcraft -> a261)."""
    w = [c for c in word.lower() if "a" <= c <= "z"]
    if not w:
        return word
    out = [w[0]]
    last = _SOUNDEX_CODE.get(w[0], "0")
    for c in w[1:]:
        if c in "hw":
            continue  # transparent: do not reset the previous code
        code = _SOUNDEX_CODE.get(c, "0")
        if code == "0":
            last = "0"
            continue
        if code != last:
            out.append(code)
            if len(out) == 4:
                break
        last = code
    return ("".join(out) + "000")[:4]


# ------------------------------------------------------- Refined Soundex
_REFINED_CODE = {}
for _letters, _d in (
    ("bp", "1"), ("fv", "2"), ("cks", "3"), ("gj", "4"), ("qxz", "5"),
    ("dt", "6"), ("l", "7"), ("mn", "8"), ("r", "9"),
):
    for _c in _letters:
        _REFINED_CODE[_c] = _d


def refined_soundex(word: str) -> str:
    """commons-codec RefinedSoundex: first letter, then the code of
    EVERY letter (vowels/h/w/y = '0') appended on each code transition,
    no length cap (testing -> t6036084)."""
    w = [c for c in word.lower() if "a" <= c <= "z"]
    if not w:
        return word
    out = [w[0]]
    last = None
    for c in w:
        code = _REFINED_CODE.get(c, "0")
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# ------------------------------------------------------ Koelner Phonetik
_KP_VOWELS = frozenset("aeijouy")


def cologne_phonetic(word: str) -> str:
    """Postel's Koelner Phonetik (1969): context-sensitive digit codes,
    collapse adjacent duplicates, strip interior '0's (muller -> 657,
    breschnew -> 17863)."""
    w = [c for c in word.lower() if "a" <= c <= "z" or c in "äöüß"]
    w = ["a" if c in "äö" else "u" if c == "ü" else "s" if c == "ß" else c
         for c in w]
    n = len(w)
    codes = []
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else ""
        nxt = w[i + 1] if i + 1 < n else ""
        if c in _KP_VOWELS:
            codes.append("0")
        elif c == "h":
            codes.append("")  # h is silent
        elif c in "b":
            codes.append("1")
        elif c == "p":
            codes.append("3" if nxt == "h" else "1")
        elif c in "dt":
            codes.append("8" if nxt in "csz" else "2")
        elif c in "fvw":
            codes.append("3")
        elif c in "gkq":
            codes.append("4")
        elif c == "c":
            if i == 0:
                codes.append("4" if nxt in "ahkloqrux" else "8")
            elif prev in "sz":
                codes.append("8")
            else:
                codes.append("4" if nxt in "ahkoqux" else "8")
        elif c == "x":
            codes.append("8" if prev in "ckq" else "48")
        elif c == "l":
            codes.append("5")
        elif c in "mn":
            codes.append("6")
        elif c == "r":
            codes.append("7")
        elif c in "sz":
            codes.append("8")
        else:
            codes.append("")
    flat = "".join(codes)
    # collapse adjacent duplicates, then drop non-leading zeros
    out = []
    for ch in flat:
        if out and out[-1] == ch:
            continue
        out.append(ch)
    collapsed = "".join(out)
    if not collapsed:
        return word
    return collapsed[0] + collapsed[1:].replace("0", "")


# ----------------------------------------------------------------- NYSIIS
_NY_VOWELS = frozenset("AEIOU")


def _nysiis_transcode(prev: str, curr: str, nxt: str, anxt: str) -> str:
    """One character-class rewrite of the NYSIIS body loop
    (Language/Nysiis.cs TranscodeRemaining — the published New York
    State Identification and Intelligence System rules)."""
    if curr == "E" and nxt == "V":
        return "AF"
    if curr in _NY_VOWELS:
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anxt == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (prev not in _NY_VOWELS or nxt not in _NY_VOWELS):
        return prev
    if curr == "W" and prev in _NY_VOWELS:
        return prev
    return curr


def nysiis(word: str, strict: bool = True) -> str:
    """NYSIIS (Taft 1970, the commons-codec edition wrapped by
    Language/Nysiis.cs): prefix/suffix normalization, in-place
    character-class transcoding with duplicate collapse, trailing
    S/AY/A cleanup; strict mode truncates to 6 (MACINTOSH -> MCANT,
    WESTERLUND -> WASTAR strict / WASTARLAD full)."""
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return ""
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(suf):
            w = w[: -len(suf)] + rep
            break
    chars = list(w)
    n = len(chars)
    key = [chars[0]]
    for i in range(1, n):
        nxt = chars[i + 1] if i < n - 1 else " "
        anxt = chars[i + 2] if i < n - 2 else " "
        tr = _nysiis_transcode(chars[i - 1], chars[i], nxt, anxt)
        for j, ch in enumerate(tr):
            if i + j < n:  # overwrite in place, never extend
                chars[i + j] = ch
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    if len(key) > 1:
        last = key[-1]
        if last == "S":
            key.pop()
            last = key[-1]
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if last == "A":  # deliberately stale after the AY removal,
            key.pop()    # matching the reference's lastChar handling
    out = "".join(key)
    return out[:6] if strict else out


# ----------------------------------------------- Match Rating Approach
_MRA_DOUBLES = [c + c for c in "BCDFGHJKLMNPQRSTVWXYZ"]


def match_rating(name: str) -> str:
    """Match Rating Approach encoder (Moore et al. 1977, Western
    Airlines; Language/MatchRatingApproachEncoder.cs): strip
    punctuation/whitespace, drop non-leading vowels, collapse doubled
    consonants (single pass), keep first 3 + last 3 when longer than 6
    (HARPER -> HRPR, Smith -> SMTH, ALESSANDRA -> ALSSDR)."""
    if not name or len(name) == 1:
        return ""
    import re as _re

    w = _re.sub(r"\-|[&]|\'|\.|[\,]", "", name.upper())
    w = _re.sub(r"\s+", "", w)
    if not w:
        return ""
    first = w[0]
    body = _re.sub(r"A|E|I|O|U", "", w)
    w = (first + body) if first in "AEIOU" else body
    for dc in _MRA_DOUBLES:
        if dc in w:
            w = w.replace(dc, dc[0])
    if len(w) > 6:
        return w[:3] + w[-3:]
    return w


# -------------------------------------------------------------- Metaphone
_MP_FRONTV = "EIY"
_MP_VARSON = "CSPTG"
_MP_VOWELS = "AEIOU"


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone (Lawrence Philips, Computer Language Dec. 1990;
    Language/Metaphone.cs is the commons-codec edition): initial-pair
    exceptions (KN/GN/PN/AE/WR/WH/X-), duplicate collapse except C,
    then the per-letter context rules, capped at ``max_code_len``
    (testing -> TSTN, SCHEDULE -> SKTL, THE -> 0)."""
    w = "".join(c for c in word.upper() if "A" <= c <= "Z")
    if not w:
        return ""
    if len(w) == 1:
        return w
    first, second = w[0], w[1]
    if first in "KGP" and second == "N":
        local = w[1:]
    elif first == "A" and second == "E":
        local = w[1:]
    elif first == "W" and second == "R":
        local = w[1:]
    elif first == "W" and second == "H":
        local = "W" + w[2:]
    elif first == "X":
        local = "S" + w[1:]
    else:
        local = w
    wdsz = len(local)

    def is_last(i: int) -> bool:
        return i == wdsz - 1

    def prev_is(i: int, c: str) -> bool:
        return 0 < i < wdsz and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return 0 <= i < wdsz - 1 and local[i + 1] == c

    def vowel(i: int) -> bool:
        return local[i] in _MP_VOWELS

    def region(i: int, t: str) -> bool:
        return i + len(t) <= wdsz and local[i : i + len(t)] == t

    code: list[str] = []
    n = 0
    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):  # collapse duplicates except C
            n += 1
            continue
        if symb in _MP_VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and is_last(n)):  # silent -MB
                code.append(symb)
        elif symb == "C":
            if prev_is(n, "S") and not is_last(n) and local[n + 1] in _MP_FRONTV:
                pass  # SCI/SCE/SCY: silent C
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and local[n + 1] in _MP_FRONTV:
                code.append("S")  # CI/CE/CY
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                # reference code: initial CH with a vowel at index 2 is
                # hard K (CHARACTER -> KRKT); otherwise X
                if n == 0 and wdsz >= 3 and vowel(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if not is_last(n + 1) and next_is(n, "G") and local[n + 2] in _MP_FRONTV:
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            if is_last(n + 1) and next_is(n, "H"):
                pass  # GH at end: silent
            elif not is_last(n + 1) and next_is(n, "H") and not vowel(n + 2):
                pass  # GH before consonant: silent
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                pass  # silent G
            elif not is_last(n) and local[n + 1] in _MP_FRONTV and not prev_is(n, "G"):
                code.append("J")
            else:
                code.append("K")
        elif symb == "H":
            if is_last(n):
                pass  # terminal H
            elif n > 0 and local[n - 1] in _MP_VARSON:
                pass
            elif vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev_is(n, "C"):
                code.append(symb)
        elif symb == "P":
            code.append("F" if next_is(n, "H") else symb)
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in TCH
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not is_last(n) and vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
        if len(code) > max_code_len:
            del code[max_code_len:]
    return "".join(code)


# ------------------------------------------------------------ Caverphone
_CV2_STEPS = [
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
]


def caverphone2(word: str) -> str:
    """Caverphone 2.0 (Hood 2004, Caversham Project ctp150804;
    Language/Caverphone2.cs): the published rewrite cascade, padded
    with '1' to exactly 10 (Stevenson -> STFNSN1111, Peter ->
    PTA1111111, add/aid/earth/... -> AT11111111)."""
    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not w:
        return "1111111111"
    if w.endswith("e"):
        w = w[:-1]
    for pre in ("cough", "rough", "tough", "enough", "trough"):
        if w.startswith(pre):
            w = pre[:-2] + "2f" + w[len(pre):]
    if w.startswith("gn"):
        w = "2n" + w[2:]
    if w.endswith("mb"):
        w = w[:-1] + "2"
    for a, b in _CV2_STEPS:
        w = w.replace(a, b)
    if w and w[0] in "aeiou":
        w = "A" + w[1:]
    w = "".join("3" if c in "aeiou" else c for c in w)
    w = w.replace("j", "y")
    if w.startswith("y3"):
        w = "Y3" + w[2:]
    if w.startswith("y"):
        w = "A" + w[1:]
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3").replace("gh", "22").replace("g", "k")
    import re as _re

    for c in "stpkfmn":
        w = _re.sub(c + "+", c.upper(), w)
    w = w.replace("w3", "W3").replace("wh3", "Wh3")
    if w.endswith("w"):
        w = w[:-1] + "3"
    w = w.replace("w", "2")
    if w.startswith("h"):
        w = "A" + w[1:]
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    if w.endswith("r"):
        w = w[:-1] + "3"
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    if w.endswith("l"):
        w = w[:-1] + "3"
    w = w.replace("l", "2")
    w = w.replace("2", "")
    if w.endswith("3"):
        w = w[:-1] + "A"
    w = w.replace("3", "")
    return (w + "1111111111")[:10]


def _dm_primary(w: str) -> str:
    """Primary Double Metaphone code, lowercased for the token space
    (the full primary/alternate pair lives in
    analysis/double_metaphone.py; PhoneticFilter's replace mode keys on
    the primary, DoubleMetaphoneFilter's originals+alternate injection
    maps to inject=True with the primary key)."""
    from lucenenet_spark.analysis.double_metaphone import double_metaphone

    return double_metaphone(w)[0].lower()


def _dm_soundex_enc(w: str) -> str:
    """Non-branching Daitch-Mokotoff code (Language/
    DaitchMokotoffSoundex.cs Encode contract); the branching code SET
    lives in analysis/dm_soundex.py dm_soundex_all for match-on-
    intersection callers."""
    from lucenenet_spark.analysis.dm_soundex import dm_soundex

    return dm_soundex(w)


_ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "cologne": cologne_phonetic,
    # encoders that code only A-Z return "" for non-alphabetic tokens;
    # fall back to the original term so numerics/punctuation tokens do
    # not all conflate into one empty posting key
    "metaphone": lambda w: metaphone(w).lower() or w,
    "double_metaphone": lambda w: _dm_primary(w) or w,
    "dm_soundex": lambda w: _dm_soundex_enc(w),
    "nysiis": lambda w: nysiis(w).lower() or w,
    "match_rating": lambda w: match_rating(w).lower() or w,
    "caverphone2": lambda w: caverphone2(w).lower(),
}


class PhoneticAnalyzer(_SnowballAnalyzer):
    """Analysis.Phonetic/PhoneticFilter.cs analogue.

    inject=False replaces each term with its phonetic key (term-
    dictionary mapping); inject=True additionally emits the key at the
    original's position (posIncrement 0) so exact AND phonetic matching
    coexist — keys that equal their source term are not duplicated."""

    def __init__(self, encoder: str = "soundex", inject: bool = False,
                 stopwords=None, **kw):
        super().__init__(stopwords, **kw)
        if encoder not in _ENCODERS:
            raise ValueError(f"unknown phonetic encoder: {encoder!r}")
        self.encoder_name = encoder
        self.encode = _ENCODERS[encoder]
        self.inject = inject

    @property
    def _stem(self):
        return self.encode

    def tokenize_batch(self, texts: pd.Series):
        if not self.inject:
            return super().tokenize_batch(texts)
        # inject mode: bypass the replace-mode stemming, then append the
        # keys as posIncr-0 overlaps (CommonGramsAnalyzer pattern);
        # field_lens counts originals only (discountOverlaps)
        row_idx, terms, positions, field_lens = StandardAnalyzer.tokenize_batch(
            self, texts
        )
        if not len(terms):
            return row_idx, terms, positions, field_lens
        codes, uniques = pd.factorize(pd.Series(terms), sort=False)
        keys = np.array([self.encode(u) for u in uniques], dtype=object)
        injected = keys[codes]
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

    def query_terms(self, text: str) -> list[tuple[str, int]]:
        """Query side always maps to the key (PhoneticFilter on the
        query chain): in inject mode the key token is in the index."""
        _, terms, positions, _ = StandardAnalyzer.tokenize_batch(
            self, pd.Series([text])
        )
        return [(self.encode(t), int(p)) for t, p in zip(terms, positions)]


class DoubleMetaphoneAnalyzer(_SnowballAnalyzer):
    """Analysis.Phonetic/DoubleMetaphoneFilter.cs analogue: each token
    emits its Double Metaphone PRIMARY code, plus the ALTERNATE code
    when it differs from the primary — and the original too in inject
    mode. The filter's emission rules are preserved exactly:

    - primary emitted only when it differs from the source token;
    - alternate emitted only when it differs from the primary AND the
      primary differed from the source (the reference's quirk);
    - inject=True keeps the original at posIncrement >= 1 with the
      codes as posIncrement-0 overlaps (field_lens counts originals
      only, discountOverlaps); inject=False replaces the original with
      the primary, the alternate still overlapping at its position."""

    def __init__(self, inject: bool = True, max_code_len: int = 4,
                 stopwords=None, **kw):
        super().__init__(stopwords, **kw)
        self.inject = inject
        self.max_code_len = max_code_len

    def _codes(self, uniques) -> tuple[np.ndarray, np.ndarray]:
        from lucenenet_spark.analysis.double_metaphone import double_metaphone

        pairs = [double_metaphone(u, self.max_code_len) for u in uniques]
        prim = np.array([p.lower() for p, _ in pairs], dtype=object)
        alt = np.array([a.lower() for _, a in pairs], dtype=object)
        return prim, alt

    @property
    def _stem(self):  # replace-mode dictionary mapping (primary key)
        from lucenenet_spark.analysis.double_metaphone import double_metaphone

        def enc(w: str) -> str:
            p = double_metaphone(w, self.max_code_len)[0].lower()
            return p if p and p != w else w

        return enc

    def tokenize_batch(self, texts: pd.Series):
        row_idx, terms, positions, field_lens = StandardAnalyzer.tokenize_batch(
            self, pd.Series(texts)
        )
        if not len(terms):
            return row_idx, terms, positions, field_lens
        codes, uniques = pd.factorize(pd.Series(terms), sort=False)
        prim_u, alt_u = self._codes(uniques)
        P, A = prim_u[codes], alt_u[codes]
        prim_differs = (P != terms) & (P != "")
        alt_differs = (A != P) & (A != "") & prim_differs
        if self.inject:
            base_r, base_t, base_p = row_idx, terms, positions
        else:
            base_r, base_p = row_idx, positions
            base_t = np.where(prim_differs, P, terms).astype(object)
            prim_differs = np.zeros_like(prim_differs)  # already in base
        out_r = np.concatenate(
            [base_r, row_idx[prim_differs], row_idx[alt_differs]]
        )
        out_t = np.concatenate([base_t, P[prim_differs], A[alt_differs]])
        out_p = np.concatenate(
            [base_p, positions[prim_differs], positions[alt_differs]]
        )
        order = np.lexsort((out_p, out_r))
        return (
            out_r[order],
            out_t[order].astype(object),
            out_p[order].astype(np.int32),
            field_lens,
        )

    def query_terms(self, text: str) -> list[tuple[str, int]]:
        """Query chain maps each token to its primary code (the
        replace-mode contract; alternates are index-side recall)."""
        _, terms, positions, _ = StandardAnalyzer.tokenize_batch(
            self, pd.Series([text])
        )
        enc = self._stem
        return [(enc(t), int(p)) for t, p in zip(terms, positions)]
