"""Brazilian Portuguese stemmer + BrazilianAnalyzer stop set.

Reimplements Analysis/Br/BrazilianStemmer.cs — a hand-written,
de-accented Portuguese suffix stripper (distinct from both the Snowball
pt pack and the RSLP stemmers). The 156 Step1/Step2 rules live as DATA
in snowball_data.py (BR_STEP1/BR_STEP2), extracted with their original
order, length guards, region conditions, and quirks (e.g. the 'logias'
rule whose replacement result is discarded but which still ends Step1 —
BrazilianStemmer.cs:499).

Semantics (BrazilianStemmer.cs:50-93):
- change_term lowercases and folds accents (ç->c, ñ->n) BEFORE any
  region computation; create_ct additionally strips one leading and one
  trailing punctuation char.
- Terms with len <= 2 or >= 30 are not indexable: Stem returns null and
  the filter keeps the original token; non-alphabetic terms return the
  changed term unstemmed.
- R1/R2/RV are captured as STRING SUFFIXES of the original CT and are
  never recomputed: Step3/4/5 test the original regions while removing
  from the current CT (guarded RemoveSuffix, so a non-matching CT tail
  is a no-op) — reproduced exactly.
- GetR1 requires the region to start before the LAST character
  (j < len-1 bounds), a deliberate difference from Snowball R1.
- Flow: step1; if it made no change, step2; step3 if either changed
  else step4; then step5.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer
from lucenenet_spark.analysis.snowball_data import BR_STEP1, BR_STEP2

_VOWELS = frozenset("aeiou")

_CHANGE = str.maketrans(
    "áâãéêíóôõúüçñ",
    "aaaeeiooouucn",
)

_PUNCT_LEAD = set("\"'-,;.?!")
_PUNCT_TRAIL = set("-,;.?!'\"")


def _change_term(v: str) -> str:
    return v.lower().translate(_CHANGE)


def _create_ct(term: str) -> str:
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in _PUNCT_LEAD:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _PUNCT_TRAIL:
        ct = ct[:-1]
    return ct


def _get_r1(v: str | None) -> str | None:
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _get_rv(v: str | None) -> str | None:
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOWELS:
        j = 2
        while j < i and v[j] not in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOWELS and v[1] in _VOWELS:
        j = 2
        while j < i and v[j] in _VOWELS:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _suffix(value: str | None, suffix: str) -> bool:
    return value is not None and value.endswith(suffix)


def _remove(value: str, to_remove: str) -> str:
    if value.endswith(to_remove):
        return value[: len(value) - len(to_remove)]
    return value


def _replace(value: str, to_replace: str, change_to: str) -> str:
    v2 = _remove(value, to_replace)
    return value if v2 == value else v2 + change_to


def _run_step(ct, regions, rules):
    """Apply the first matching rule; returns (new_ct, matched)."""
    for (greg, gmin, mreg, suf, creg, csuf, preg, psuf, pstr, acts) in rules:
        if greg is not None:
            gval = ct if greg == "CT" else regions.get(greg)
            if gval is None or len(gval) < gmin:
                continue
        mval = ct if mreg == "CT" else regions.get(mreg)
        if not _suffix(mval, suf):
            continue
        if creg is not None and not _suffix(regions.get(creg, ct if creg == "CT" else None), csuf):
            continue
        if preg is not None:
            pval = ct if preg == "CT" else regions.get(preg)
            if not (_suffix(pval, psuf)
                    and _remove(pval, psuf).endswith(pstr)):
                continue
        for kind, a, b in acts:
            if kind == "remove":
                ct = _remove(ct, a)
            elif kind == "replace":
                ct = _replace(ct, a, b)
            # *_noop kinds: result discarded in the reference
        return ct, True
    return ct, False


def brazilian_stem(term: str) -> str | None:
    """BrazilianStemmer.cs Stem(): None = not indexable (the filter
    keeps the original token)."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    ct, altered = _run_step(ct, regions, BR_STEP1)
    if not altered:
        ct, altered = _run_step(ct, regions, BR_STEP2)
    if altered:
        # step3: RV ends 'ci' + final i -> drop the i
        if _suffix(rv, "i") and _suffix(_remove(rv, "i"), "c"):
            ct = _remove(ct, "i")
    else:
        # step4: residual suffix from the ORIGINAL RV
        for s in ("os", "a", "i", "o"):
            if _suffix(rv, s):
                ct = _remove(ct, s)
                break
    # step5: final e (gue -> g, cie -> c quirk order)
    if _suffix(rv, "e"):
        if _suffix(_remove(rv, "e"), "gu"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "u")
        elif _suffix(_remove(rv, "e"), "ci"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "i")
        else:
            ct = _remove(ct, "e")
    return ct


def _brazilian_token_stem(term: str) -> str:
    """BrazilianStemFilter.cs contract: keep the token when Stem is
    null or identical."""
    s = brazilian_stem(term)
    return term if s is None or s == term else s


BRAZILIAN_STOP_WORDS = frozenset("""
a ainda alem ambas ambos antes ao aonde aos apos aquele aqueles as
assim com como contra contudo cuja cujas cujo cujos da das de dela
dele deles demais depois desde desta deste dispoe dispoem diversa
diversas diversos do dos durante e ela elas ele eles em entao entre
essa essas esse esses esta estas este estes ha isso isto logo mais
mas mediante menos mesma mesmas mesmo mesmos na nas nao nem nesse
neste nos o os ou outra outras outro outros pelas pelo pelos perante
pois por porque portanto proprio propios quais qual qualquer quando
quanto que quem quer se seja sem sendo seu seus sob sobre sua suas
tal tambem teu teus toda todas todo todos tua tuas tudo um uma umas
uns
""".split())


class BrazilianAnalyzer(_SnowballAnalyzer):
    """Analysis/Br/BrazilianAnalyzer.cs analogue (stop set +
    BrazilianStemFilter)."""

    _stem = staticmethod(_brazilian_token_stem)

    def __init__(self, stopwords=BRAZILIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
