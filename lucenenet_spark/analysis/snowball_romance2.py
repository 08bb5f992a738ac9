"""Snowball stemmers + stop sets: Romanian, Catalan.

Reimplements the PUBLISHED Snowball algorithms
(snowballstem.org/algorithms/romanian/stemmer.html and the contributed
Catalan algorithm) that the reference compiles from — the reference's
analyzers are Analysis/Ro/RomanianAnalyzer.cs and
Analysis/Ca/CatalanAnalyzer.cs (each: StandardTokenizer -> [Elision for
ca] -> LowerCase -> Stop -> SnowballFilter); the stemmer semantics are
specified by Tartarus/Snowball/Ext/{Romanian,Catalan}Stemmer.cs.  Among
tables live in snowball_data.py (generated data); this module is the
hand-written driver logic.

Among semantics (same conventions as the rest of the family):
- A backward among finds the LONGEST entry that is a suffix of the word;
  the matched entry's rule then runs with NO fallback to shorter entries
  if its R1/R2 condition fails (FindAmongB -> r_R1() call order).
- Only an among run under setlimit (Romanian's verb_suffix, limited to
  RV) skips candidates that start before the limit during matching.

Catalan's ElisionFilter (d'/l'/m'/n'/s'/t' articles) is handled by the
tokenizer, which breaks on apostrophes for this corpus alphabet — same
documented approach as French/Italian.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _r_after, _SnowballAnalyzer
from lucenenet_spark.analysis.snowball_data import (
    CA_A1,
    CA_A2,
    CA_A3,
    CA_A4,
    RO_A1,
    RO_A2,
    RO_A3,
    RO_A4,
    RO_A5,
)


def _longest(w: str, among, limit: int = 0):
    """Longest among entry that is a suffix of `w` starting at or after
    `limit` (backward setlimit). Returns (suffix, code) or (None, 0)."""
    n = len(w)
    for s, code in among:
        if w.endswith(s) and n - len(s) >= limit:
            return s, code
    return None, 0


# ===========================================================================
# Romanian — snowballstem.org/algorithms/romanian/stemmer.html
# (cedilla forms ş U+015F / ţ U+0163, as published; web text using the
# comma-below forms ș/ț should be normalized upstream)
# ===========================================================================

ROMANIAN_STOP_WORDS = frozenset("""
acea aceasta această aceea acei aceia acel acela acele acelea acest
acesta aceste acestea aceşti aceştia acolo acum ai aia aibă aici al ăla
ale alea ălea altceva altcineva am ar are aş aşadar asemenea asta ăsta
astăzi astea ăstea ăştia asupra aţi au avea avem aveţi azi bine bucur
bună ca că căci când care cărei căror cărui cât câte câţi către câtva ce
cel ceva chiar cînd cine cineva cît cîte cîţi cîtva contra cu cum cumva
curând curînd da dă dacă dar datorită de deci deja deoarece departe deşi
din dinaintea dintr dintre drept după ea ei el ele eram este eşti eu
face fără fi fie fiecare fii fim fiţi iar ieri îi îl îmi împotriva în
înainte înaintea încât încît încotro între întrucât întrucît îţi la
lângă le li lîngă lor lui mă mâine mea mei mele mereu meu mi mine mult
multă mulţi ne nicăieri nici nimeni nişte noastră noastre noi noştri
nostru nu ori oricând oricare oricât orice oricînd oricine oricît oricum
oriunde până pe pentru peste pînă poate pot prea prima primul prin
printr sa să săi sale sau său se şi sînt sîntem sînteţi spre sub sunt
suntem sunteţi ta tăi tale tău te ţi ţie tine toată toate tot toţi
totuşi tu un una unde undeva unei unele uneori unor vă vi voastră
voastre voi voştri vostru vouă vreo vreun
""".split())

_RO_VOWELS = frozenset("aeiouâîă")


def _ro_prelude(w: str) -> str:
    """i/u between vowels -> I/U (marked non-vowel; postlude restores).
    Left neighbor is tested against the mutated buffer (an already-marked
    I/U no longer counts as a vowel), right neighbor against the input —
    the cursor in the published scan sits past each replacement."""
    out = list(w)
    for j in range(1, len(w) - 1):
        if out[j] in "iu" and out[j - 1] in _RO_VOWELS and w[j + 1] in _RO_VOWELS:
            out[j] = out[j].upper()
    return "".join(out)


def _ro_rv(w: str) -> int:
    """Standard Romance RV (shared with es/pt): second-letter consonant ->
    after the next vowel; two leading vowels -> after the next consonant;
    else after the third letter."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _RO_VOWELS:
        for i in range(2, n):
            if w[i] in _RO_VOWELS:
                return i + 1
        return n
    if w[0] in _RO_VOWELS and w[1] in _RO_VOWELS:
        for i in range(2, n):
            if w[i] not in _RO_VOWELS:
                return i + 1
        return n
    return 3


def _ro_step0(w: str, r1: int) -> str:
    """Removal of plurals / definite articles (rules in R1)."""
    s, code = _longest(w, RO_A1)
    if not s:
        return w
    pos = len(w) - len(s)
    if pos < r1:
        return w
    if code == 1:      # ul ului
        return w[:pos]
    if code == 2:      # aua -> a
        return w[:pos] + "a"
    if code == 3:      # ea ele elor -> e
        return w[:pos] + "e"
    if code == 4:      # ii iua iei iile ii lor ilor -> i
        return w[:pos] + "i"
    if code == 5:      # ile -> i, unless preceded by ab
        if w[:pos].endswith("ab"):
            return w
        return w[:pos] + "i"
    if code == 6:      # atei -> at
        return w[:pos] + "at"
    # code == 7: aţie/aţia -> aţi
    return w[:pos] + "aţi"


_RO_COMBO_REPL = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at", 6: "it"}


def _ro_standard(w: str, r1: int, r2: int) -> tuple[str, bool]:
    """Combining-suffix reduction (repeat, in R1) then the standard
    suffix among (in R2). Returns (word, standard_suffix_removed)."""
    removed = False
    while True:
        s, code = _longest(w, RO_A2)
        if s and len(w) - len(s) >= r1:
            w = w[: len(w) - len(s)] + _RO_COMBO_REPL[code]
            removed = True
            continue
        break
    s, code = _longest(w, RO_A3)
    if s:
        pos = len(w) - len(s)
        if pos >= r2:
            if code == 1:
                w, removed = w[:pos], True
            elif code == 2:
                # iune/iuni delete only when preceded by ţ, which becomes t
                if w[:pos].endswith("ţ"):
                    w, removed = w[: pos - 1] + "t", True
            else:  # code == 3: ism/ist family -> ist
                w, removed = w[:pos] + "ist", True
    return w, removed


def _ro_verb(w: str, rv: int) -> str:
    """Verb suffixes, among limited to RV (setlimit): suffixes straddling
    the RV boundary fall back to shorter in-RV candidates."""
    s, code = _longest(w, RO_A4, limit=rv)
    if not s:
        return w
    pos = len(w) - len(s)
    if code == 1:
        # delete only when preceded WITHIN RV by a non-vowel or by 'u'
        if pos - 1 >= rv and (w[pos - 1] not in _RO_VOWELS or w[pos - 1] == "u"):
            return w[:pos]
        return w
    return w[:pos]  # code == 2: unconditional delete


def _ro_vowel(w: str, rv: int) -> str:
    s, _code = _longest(w, RO_A5)
    if s and len(w) - len(s) >= rv:
        return w[: len(w) - len(s)]
    return w


def romanian_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/RomanianStemmer.cs semantics: prelude,
    mark_regions, step_0, standard_suffix, verb_suffix (only if no
    standard suffix was removed), vowel_suffix, postlude."""
    w = _ro_prelude(word)
    rv = _ro_rv(w)
    r1 = _r_after(w, 0, _RO_VOWELS)
    r2 = _r_after(w, r1, _RO_VOWELS)
    w = _ro_step0(w, r1)
    w, removed = _ro_standard(w, r1, r2)
    if not removed:
        w = _ro_verb(w, rv)
    w = _ro_vowel(w, rv)
    return w.replace("I", "i").replace("U", "u")


# ===========================================================================
# Catalan — contributed Snowball algorithm (Israel Olalla / iSOCO), as
# compiled into the reference's Tartarus CatalanStemmer.cs
# ===========================================================================

CATALAN_STOP_WORDS = frozenset("""
a abans ací ah així això al als aleshores algun alguna algunes alguns
alhora allà allí allò altra altre altres amb ambdós ambdues apa aquell
aquella aquelles aquells aquest aquesta aquestes aquests aquí baix cada
cadascú cadascuna cadascunes cadascuns com contra dalt de del dels des
després dins dintre donat doncs durant e eh el els em en encara ens
entre érem eren éreu es és esta està estàvem estaven estàveu esteu et
etc ets fins fora gairebé ha han has havia he hem heu hi ho i igual
iguals ja la les li llavors ma mal malgrat mateix mateixa mateixes
mateixos me mentre més meu meus meva meves molt molta moltes molts mon
mons ne ni no nogensmenys només nosaltres nostra nostre nostres o oh oi
on pas pel pels per però perquè poc poca pocs poques potser propi qual
quals quan quant que què quelcom qui quin quina quines quins sa
semblant semblants ses seu seus seva seves si sobre sobretot sóc
solament sols son són sons sota sou ta tal també tampoc tan tant tanta
tantes teu teus teva teves ton tons tot tota totes tots un una unes uns
us va vaig vam van vas veu vosaltres vostra vostre vostres
""".split())

_CA_VOWELS = frozenset("aeiouàáèéíïòóúü")

_CA_CLEAN = str.maketrans({
    "á": "a", "à": "a", "é": "e", "è": "e", "í": "i", "ì": "i", "ï": "i",
    "ó": "o", "ò": "o", "ú": "u", "ü": "u", "·": ".",
})


def catalan_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/CatalanStemmer.cs semantics: mark_regions
    (plain R1/R2, no RV), attached_pronoun, (standard_suffix or
    verb_suffix), residual_suffix, accent cleaning."""
    w = word
    r1 = _r_after(w, 0, _CA_VOWELS)
    r2 = _r_after(w, r1, _CA_VOWELS)

    # attached pronouns ('ls, 'ns, -me, -nos, -selas, ...): R1 delete
    s, code = _longest(w, CA_A1)
    if s and code == 1 and len(w) - len(s) >= r1:
        w = w[: len(w) - len(s)]

    # standard suffixes; only if that among fails entirely, verb suffixes
    def _standard(w: str) -> str | None:
        s, code = _longest(w, CA_A2)
        if not s:
            return None
        pos = len(w) - len(s)
        if code == 1 and pos >= r1:
            return w[:pos]
        if code == 2 and pos >= r2:
            return w[:pos]
        if code == 3 and pos >= r2:
            return w[:pos] + "log"
        if code == 4 and pos >= r2:
            return w[:pos] + "ic"
        if code == 5 and pos >= r1:
            return w[:pos] + "c"
        return None

    def _verb(w: str) -> str | None:
        s, code = _longest(w, CA_A3)
        if not s:
            return None
        pos = len(w) - len(s)
        if code == 1 and pos >= r1:
            return w[:pos]
        if code == 2 and pos >= r2:
            return w[:pos]
        return None

    out = _standard(w)
    if out is None:
        out = _verb(w)
    if out is not None:
        w = out

    # residual single-vowel / -ic endings (R1)
    s, code = _longest(w, CA_A4)
    if s:
        pos = len(w) - len(s)
        if code == 1 and pos >= r1:
            w = w[:pos]
        elif code == 2 and pos >= r1:
            w = w[:pos] + "ic"

    return w.translate(_CA_CLEAN)


# ===========================================================================
# Analyzers
# ===========================================================================


class RomanianAnalyzer(_SnowballAnalyzer):
    """Analysis/Ro/RomanianAnalyzer.cs analogue (stop set + Snowball
    Romanian)."""

    _stem = staticmethod(romanian_stem)

    def __init__(self, stopwords=ROMANIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class CatalanAnalyzer(_SnowballAnalyzer):
    """Analysis/Ca/CatalanAnalyzer.cs analogue (elision via the
    tokenizer's apostrophe break + stop set + Snowball Catalan)."""

    _stem = staticmethod(catalan_stem)

    def __init__(self, stopwords=CATALAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
