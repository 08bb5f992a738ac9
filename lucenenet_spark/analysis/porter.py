"""Porter stemming algorithm (Porter, 1980, "An algorithm for suffix
stripping", Program 14(3):130-137) — including the two documented
departures of Martin Porter's public reference implementation
(https://tartarus.org/martin/PorterStemmer/: bli->ble instead of
abli->able, and the added logi->log), which the reference's
PorterStemmer.cs (src/Lucene.Net.Analysis.Common/Analysis/En/
PorterStemmer.cs, 872 LoC) also follows.

Written from the published algorithm — NOT a port of the C#/Java code.
Driver/executor-side scalar; the analyzer stems only the batch's term
DICTIONARY (unique tokens), so the per-token cost is amortized across
duplicate tokens (vocab << token count on natural text).
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    forms = ""
    for i in range(len(stem)):
        forms += "c" if _is_cons(stem, i) else "v"
    m = 0
    i = 0
    n = len(forms)
    while i < n and forms[i] == "c":
        i += 1
    while True:
        while i < n and forms[i] == "v":
            i += 1
        if i >= n:
            return m
        while i < n and forms[i] == "c":
            i += 1
        m += 1
        if i >= n:
            return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _rule(word: str, suffix: str, replacement: str, min_m: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + replacement
    return word  # matched the longest suffix but condition failed: stop


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"),  # departure (paper: abli->able)
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
    ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),  # departure (added rule)
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # ---- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # ---- step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w = w + "e"

    # ---- step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # ---- step 2 (longest matching suffix; condition m > 0)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 3 (m > 0)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # ---- step 4 (m > 1; 'ion' needs preceding s or t)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break

    # ---- step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # ---- step 5b
    if _measure(w) > 1 and w.endswith("ll"):
        w = w[:-1]

    return w


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter: drop trailing 's (Analysis/En/
    EnglishPossessiveFilter.cs)."""
    if word.endswith("'s") or word.endswith("’s"):
        return word[:-2]
    return word
