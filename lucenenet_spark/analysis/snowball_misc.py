"""Snowball stemmers + stop sets: Armenian, Irish, Basque.

Reimplements the PUBLISHED Snowball algorithms
(snowballstem.org/algorithms/{armenian,irish,basque}/stemmer.html) the
reference compiles from — Analysis/Hy/ArmenianAnalyzer.cs,
Analysis/Ga/IrishAnalyzer.cs, Analysis/Eu/BasqueAnalyzer.cs; stemmer
semantics specified by Tartarus/Snowball/Ext/{Armenian,Irish,Basque}
Stemmer.cs. Among tables live in snowball_data.py.

Semantics notes (traced from the generated programs):

- Armenian: the whole backward section runs under setlimit-to-pV
  (pV = after the first vowel), so a suffix starting before pV is not a
  match and matching falls back to shorter entries during the among
  scan; `ending` additionally requires R2 AFTER the match with no
  fallback (ArmenianStemmer.cs r_ending: R2 check between FindAmongB
  and the switch). Step order: ending, verb, adjective, noun — each an
  independent `do`.
- Irish: initial_morph is a FORWARD longest-prefix among (eclipsis /
  lenition / pre-vowel h-,n-,t- and elided d'/b'/m'); regions are then
  computed on the modified word. The three backward steps (noun_sfx,
  deriv, verb_sfx) have no global limit; a failed R1/R2/RV condition
  fails the whole step with no fallback to shorter entries.
- Basque: aditzak and izenak run under `repeat` — and the Snowball
  cursor survives BOTH loops and the final adjetiboak `do`: after a
  slice the cursor sits at the slice start, so the next among matches
  suffixes ending THERE (replacement text is never re-examined). The
  drivers thread an explicit end pointer to reproduce this
  (BasqueStemmer.cs Stem(): no cursor reset between replab1/replab3).
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer, _r_after
from lucenenet_spark.analysis.snowball_data import (
    EU_A0,
    EU_A1,
    EU_A2,
    GA_A0,
    GA_A1,
    GA_A2,
    GA_A3,
    HY_A0,
    HY_A1,
    HY_A2,
    HY_A3,
)
from lucenenet_spark.analysis.snowball_romance2 import _longest

# ===========================================================================
# Armenian
# ===========================================================================

_HY_VOWELS = frozenset("աեէըիուօ")


def _hy_pv(w: str) -> int:
    for i, ch in enumerate(w):
        if ch in _HY_VOWELS:
            return i + 1
    return len(w)


def _hy_del(w: str, among, pv: int, p2: int | None = None) -> str:
    s, _code = _longest(w, among, limit=pv)
    if not s:
        return w
    pos = len(w) - len(s)
    if p2 is not None and pos < p2:
        return w
    return w[:pos]


def armenian_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/ArmenianStemmer.cs semantics."""
    w = word
    pv = _hy_pv(w)
    r1 = _r_after(w, 0, _HY_VOWELS)
    p2 = _r_after(w, r1, _HY_VOWELS)
    w = _hy_del(w, HY_A3, pv, p2)   # ending (R2-checked, no fallback)
    w = _hy_del(w, HY_A1, pv)       # verb
    w = _hy_del(w, HY_A0, pv)       # adjective
    w = _hy_del(w, HY_A2, pv)       # noun
    return w


# ===========================================================================
# Irish
# ===========================================================================

_GA_VOWELS = frozenset("aeiouáéíóú")

# initial_morph actions: code -> replacement prefix (None = delete)
_GA_PREFIX_ACT = {
    1: None, 2: None, 3: "f", 4: None,
    5: "s", 6: "b", 7: "c", 8: "d", 9: "f", 10: "g", 11: "p", 12: "s",
    13: "t", 14: "b", 15: "c", 16: "d", 17: "f", 18: "g", 19: "m",
    20: "p", 21: "t",
}

_GA_PREFIXES = sorted(GA_A0, key=lambda r: -len(r[0]))

_GA_DERIV_ACT = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}


def _ga_initial_morph(w: str) -> str:
    for s, code in _GA_PREFIXES:
        if w.startswith(s):
            repl = _GA_PREFIX_ACT[code]
            return (repl or "") + w[len(s):]
    return w


def irish_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/IrishStemmer.cs semantics."""
    w = _ga_initial_morph(word)
    pv = next((i + 1 for i, ch in enumerate(w) if ch in _GA_VOWELS), len(w))
    r1 = _r_after(w, 0, _GA_VOWELS)
    r2 = _r_after(w, r1, _GA_VOWELS)

    # noun_sfx: code 1 -> R1 delete, code 2 -> R2 delete (no fallback)
    s, code = _longest(w, GA_A1)
    if s:
        pos = len(w) - len(s)
        if (code == 1 and pos >= r1) or (code == 2 and pos >= r2):
            w = w[:pos]
    # deriv: code 1 -> R2 delete, others unconditional replacements
    s, code = _longest(w, GA_A2)
    if s:
        pos = len(w) - len(s)
        if code == 1:
            if pos >= r2:
                w = w[:pos]
        else:
            w = w[:pos] + _GA_DERIV_ACT[code]
    # verb_sfx: code 1 -> RV delete, code 2 -> R1 delete
    s, code = _longest(w, GA_A3)
    if s:
        pos = len(w) - len(s)
        if (code == 1 and pos >= pv) or (code == 2 and pos >= r1):
            w = w[:pos]
    return w


# ===========================================================================
# Basque
# ===========================================================================

_EU_VOWELS = frozenset("aeiou")


def _eu_rv(w: str) -> int:
    """Spanish-shaped RV over plain aeiou (BasqueStemmer.cs
    r_mark_regions)."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _EU_VOWELS:
        for i in range(2, n):
            if w[i] in _EU_VOWELS:
                return i + 1
        return n
    if w[0] in _EU_VOWELS:
        for i in range(2, n):
            if w[i] not in _EU_VOWELS:
                return i + 1
        return n
    return 3


_EU_ADITZAK_ACT = {3: "atseden", 4: "arabera", 5: "baditu"}
_EU_IZENAK_ACT = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                  8: "geldi", 9: "igaro", 10: "aurka"}


def _eu_suffix_at(w: str, e: int, among):
    """Longest among entry that is a suffix of w[:e] (ket pinned at e)."""
    head = w[:e]
    n = len(head)
    for s, code in among:
        if head.endswith(s):
            return s, code, n - len(s)
    return None, 0, 0


def _eu_apply(w: str, e: int, among, acts, pv: int, r1: int, r2: int):
    """One among application with the carried end pointer. Returns
    (w, e, success)."""
    s, code, pos = _eu_suffix_at(w, e, among)
    if not s:
        return w, e, False
    if code == 1:
        if pos < pv:
            return w, e, False
        return w[:pos] + w[e:], pos, True
    if code == 2:
        if pos < r2:
            return w, e, False
        return w[:pos] + w[e:], pos, True
    if code == 4:
        if pos < r1:
            return w, e, False
        return w[:pos] + w[e:], pos, True
    repl = acts[code]
    return w[:pos] + repl + w[e:], pos, True


def basque_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/BasqueStemmer.cs semantics: repeat aditzak,
    repeat izenak, do adjetiboak — with the cursor (end pointer)
    persisting across all three phases."""
    w = word
    pv = _eu_rv(w)
    r1 = _r_after(w, 0, _EU_VOWELS)
    r2 = _r_after(w, r1, _EU_VOWELS)
    e = len(w)
    for _ in range(50):                      # repeat aditzak
        w, e, ok = _eu_apply(w, e, EU_A0, _EU_ADITZAK_ACT, pv, r1, r2)
        if not ok:
            break
    for _ in range(50):                      # repeat izenak
        w, e, ok = _eu_apply(w, e, EU_A1, _EU_IZENAK_ACT, pv, r1, r2)
        if not ok:
            break
    # do adjetiboak: code 1 -> RV delete, code 2 -> 'z'
    s, code, pos = _eu_suffix_at(w, e, EU_A2)
    if s:
        if code == 1:
            if pos >= pv:
                w = w[:pos] + w[e:]
        else:
            w = w[:pos] + "z" + w[e:]
    return w


# ===========================================================================
# Stop sets (the reference's Analysis/{Hy,Ga,Eu}/stopwords.txt lists)
# ===========================================================================

ARMENIAN_STOP_WORDS = frozenset("""
այդ այլ այն այս դու դուք եմ են ենք ես եք է էի էին էինք էիր էիք էր ըստ
թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ մի ն նա նաև նրա նրանք որ որը
որոնք որպես ու ում պիտի վրա և
""".split())

IRISH_STOP_WORDS = frozenset("""
a ach ag agus an aon ar arna as b' ba beirt bhúr caoga ceathair
ceathrar chomh chtó chuig chun cois céad cúig cúigear d' daichead dar
de deich deichniúr den dhá do don dtí dá dár dó faoi faoin faoina
faoinár fara fiche gach gan go gur haon hocht i iad idir in ina ins
inár is le leis lena lenár m' mar mo mé na nach naoi naonúr ná ní níor
nó nócha ocht ochtar os roimh sa seacht seachtar seachtó seasca
seisear siad sibh sinn sna sé sí tar thar thú triúr trí trína trínár
tríocha tú um ár é éis í ó ón óna ónár
""".split())

# The reference's IrishAnalyzer also stops the standalone hyphenation
# prefixes (h,n,t) BEFORE lowercasing and elides the d'/m'/b' articles;
# this tokenizer splits both the hyphen and the apostrophe, so those
# fragments surface as standalone tokens — stopped here (documented
# deviation: the uppercase-prothesis hyphen insertion of
# IrishLowerCaseFilter.cs needs pre-lowercase case info and only
# affects mixed-case text).
IRISH_EXTRA_STOPS = frozenset(["h", "n", "t", "d", "m", "b"])

BASQUE_STOP_WORDS = frozenset("""
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek beste
bezala da dago dira ditu du dute edo egin ere eta eurak ez gainera gu
gutxi guzti haiei haiek haietan hainbeste hala han handik hango hara
hari hark hartan hau hauei hauek hauetan hemen hemendik hemengo hi
hona honek honela honetan honi hor hori horiei horiek horietan horko
horra horrek horrela horretan horri hortik hura izan ni noiz nola non
nondik nongo nor nora ze zein zen zenbait zenbat zer zergatik ziren
zituen zu zuek zuen zuten
""".split())


class ArmenianAnalyzer(_SnowballAnalyzer):
    """Analysis/Hy/ArmenianAnalyzer.cs analogue (stop set + Snowball
    Armenian)."""

    _stem = staticmethod(armenian_stem)

    def __init__(self, stopwords=ARMENIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class IrishAnalyzer(_SnowballAnalyzer):
    """Analysis/Ga/IrishAnalyzer.cs analogue (hyphenation/article stops
    + stop set + Snowball Irish)."""

    _stem = staticmethod(irish_stem)

    def __init__(self, stopwords=IRISH_STOP_WORDS, **kw):
        super().__init__(frozenset(stopwords) | IRISH_EXTRA_STOPS, **kw)


class BasqueAnalyzer(_SnowballAnalyzer):
    """Analysis/Eu/BasqueAnalyzer.cs analogue (stop set + Snowball
    Basque)."""

    _stem = staticmethod(basque_stem)

    def __init__(self, stopwords=BASQUE_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
