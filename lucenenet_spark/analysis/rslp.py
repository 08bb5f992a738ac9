"""RSLP stemming engine + Galician / Portuguese-RSLP stemmers.

Reimplements the PUBLISHED RSLP algorithm (V. Orengo & C. Huyck, "A
stemming algorithm for the Portuguese language", SPIRE 2001) that the
reference drives from rule data files — Analysis/Pt/RSLPStemmerBase.cs
(engine), Analysis/Gl/GalicianStemmer.cs + galician.rslp,
Analysis/Pt/PortugueseStemmer.cs + portuguese.rslp,
Analysis/Gl/GalicianMinimalStemmer.cs (Plural step only). Rule data
lives in snowball_data.py (GL_STEPS / PT_STEPS).

Engine semantics (RSLPStemmerBase.cs:60-160):
- A rule (suffix, min, replacement, exceptions) matches when the word
  ends with the suffix and the remaining stem length is >= min; the
  step's `type` selects whole-word (1) vs ends-with (0) exception
  checks. A step optionally requires one of its condition suffixes,
  needs word length >= its min (or the computed min over rules when 0),
  and applies the FIRST matching rule only.
- GalicianStemmer.cs flow: plural, unification, adverb,
  repeat(augmentative), noun, verb only if noun removed nothing, vowel,
  then de-accenting.
- PortugueseStemmer.cs flow: plural, adverb, feminine, augmentative,
  noun; verb only if noun removed nothing; vowel only if verb removed
  nothing; then de-accenting.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer
from lucenenet_spark.analysis.snowball_data import GL_STEPS, PT_STEPS


class _Step:
    __slots__ = ("min", "cond", "rules")

    def __init__(self, spec):
        mn, typ, cond, rules = spec
        if mn == 0:
            mn = min(r[1] + len(r[0]) for r in rules)
        self.min = mn
        self.cond = tuple(cond)
        # pre-resolve the exception predicate per rule
        self.rules = tuple(
            (
                suffix,
                rmin,
                repl,
                (frozenset(exc) if typ == 1 else tuple(exc)) if exc else None,
                typ,
            )
            for suffix, rmin, repl, exc in rules
        )

    def apply(self, w: str) -> str:
        if len(w) < self.min:
            return w
        if self.cond and not any(w.endswith(s) for s in self.cond):
            return w
        for suffix, rmin, repl, exc, typ in self.rules:
            if len(w) - len(suffix) >= rmin and w.endswith(suffix):
                if exc is not None:
                    if typ == 1:
                        if w in exc:
                            continue
                    elif any(w.endswith(e) for e in exc):
                        continue
                return w[: len(w) - len(suffix)] + repl
        return w


def _compile(steps_spec):
    return {name: _Step(spec) for name, spec in steps_spec.items()}


_GL = _compile(GL_STEPS)
_PT = _compile(PT_STEPS)

_GL_UNACCENT = str.maketrans("áéêíóú", "aeeiou")
_PT_UNACCENT = str.maketrans(
    "àáâãäåèéêëìíîïòóôõöùúûü", "aaaaaaeeeeiiiiooooouuuu"
)


def galician_stem(word: str) -> str:
    """GalicianStemmer.cs flow over the galician.rslp rule data."""
    w = _GL["Plural"].apply(word)
    w = _GL["Unification"].apply(w)
    w = _GL["Adverb"].apply(w)
    while True:
        w2 = _GL["Augmentative"].apply(w)
        if w2 == w:
            break
        w = w2
    w2 = _GL["Noun"].apply(w)
    if w2 == w:
        w2 = _GL["Verb"].apply(w)
    w = _GL["Vowel"].apply(w2)
    return w.translate(_GL_UNACCENT)


def galician_minimal_stem(word: str) -> str:
    """GalicianMinimalStemmer.cs: the Plural step only, no
    de-accenting."""
    return _GL["Plural"].apply(word)


def portuguese_rslp_stem(word: str) -> str:
    """PortugueseStemmer.cs flow over the portuguese.rslp rule data
    (the PortugueseStemFilter option; the PortugueseAnalyzer default is
    the light stemmer, and the Snowball pt pack covers SnowballFilter)."""
    w = _PT["Plural"].apply(word)
    w = _PT["Adverb"].apply(w)
    w = _PT["Feminine"].apply(w)
    w = _PT["Augmentative"].apply(w)
    w2 = _PT["Noun"].apply(w)
    if w2 == w:
        w2 = _PT["Verb"].apply(w)
        if w2 == w:
            w2 = _PT["Vowel"].apply(w)
    return w2.translate(_PT_UNACCENT)


GALICIAN_STOP_WORDS = frozenset("""
a aínda alí aquel aquela aquelas aqueles aquilo aquí ao aos as así á
ben cando che co coa comigo con connosco contigo convosco coas cos cun
cuns cunha cunhas da dalgunha dalgunhas dalgún dalgúns das de del dela
delas deles desde deste do dos dun duns dunha dunhas e el ela elas
eles en era eran esa esas ese eses esta estar estaba está están este
estes estiven estou eu é facer foi foron fun había hai iso isto la
las lle lles lo los mais me meu meus min miña miñas moi na nas neste
nin no non nos nosa nosas noso nosos nós nun nunha nuns nunhas o os
ou ó ós para pero pode pois pola polas polo polos por que se senón
ser seu seus sexa sido sobre súa súas tamén tan te ten teñen teño
ter teu teus ti tido tiña tiven túa túas un unha unhas uns vos vosa
vosas voso vosos vós
""".split())


class GalicianAnalyzer(_SnowballAnalyzer):
    """Analysis/Gl/GalicianAnalyzer.cs analogue (stop set + RSLP
    Galician)."""

    _stem = staticmethod(galician_stem)

    def __init__(self, stopwords=GALICIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class GalicianMinimalAnalyzer(_SnowballAnalyzer):
    """GalicianMinimalStemFilter as an analyzer: plural reduction
    only."""

    _stem = staticmethod(galician_minimal_stem)

    def __init__(self, stopwords=GALICIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
