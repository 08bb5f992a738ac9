"""Scandinavian Snowball language packs: Swedish, Norwegian, Danish.

Reimplements the published Snowball algorithms
(snowballstem.org/algorithms/{swedish,norwegian,danish}/stemmer.html) that
the reference's machine-generated Tartarus classes compile from —
Lucene.Net.Analysis.Common/Analysis/Sv/SwedishAnalyzer.cs,
No/NorwegianAnalyzer.cs, Da/DanishAnalyzer.cs (each: StandardTokenizer ->
LowerCase -> Stop -> SnowballFilter).

Shared Scandinavian machinery: R1 = region after the first non-vowel
following a vowel, adjusted so at least 3 letters precede it. Suffix
amongs run limited to R1 (setlimit tomark p1): a candidate suffix that
starts before R1 cannot match at all, so a SHORTER candidate that fits
matches instead; but once a candidate IS matched, a failing attached
condition (the valid-s-ending test) fails the whole among with no
fallback to shorter suffixes — Snowball among picks one string by the
longest-match trie, then runs its routine.

Stop sets are the Snowball project stop lists (bokmål core for
Norwegian). Gate oracles embed the identical lists, so engine/oracle
comparisons are exact regardless of list extent.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer, _r_after


def _among_r1(w: str, r1: int, candidates: list[str]) -> str | None:
    """Longest candidate that both matches the end of `w` and lies wholly
    inside R1 (the setlimit-limited among match), or None."""
    for s in candidates:
        if w.endswith(s) and len(w) - len(s) >= r1:
            return s
    return None


def _scand_r1(w: str, vowels: frozenset[str]) -> int:
    """R1 with the Scandinavian adjustment: at least 3 letters precede."""
    return max(_r_after(w, 0, vowels), 3)


# ===========================================================================
# Swedish — snowballstem.org/algorithms/swedish/stemmer.html
# ===========================================================================

SWEDISH_STOP_WORDS = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
din dessa några deras blir mina samma vilken er sådan vår blivit dess
inom mellan sådant varför varje vilka ditt vem vilket sitta sådana vart
dina vars vårt våra ert era vilkas
""".split())

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")

_SV_STEP1 = sorted(
    """a arna erna heterna orna ad e ade ande arne are aste en anden aren
    heten ern ar er heter or as arnas ernas ornas es ades andes ens arens
    hetens erns at andet het ast s""".split(),
    key=len, reverse=True,
)
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3 = sorted(["lig", "ig", "els", "löst", "fullt"], key=len, reverse=True)


def swedish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _SV_VOWELS)

    # step 1: main suffix among (delete), with 's' conditional on a valid
    # s-ending before it
    m = _among_r1(w, r1, _SV_STEP1)
    if m == "s":
        if len(w) >= 2 and w[-2] in _SV_S_END:
            w = w[:-1]
    elif m is not None:
        w = w[: -len(m)]

    # step 2: word ends one of the consonant pairs, the WHOLE pair inside
    # R1 (setlimit brackets both chars) -> drop last letter
    if any(w.endswith(p) for p in _SV_PAIRS) and len(w) - 2 >= r1:
        w = w[:-1]

    # step 3 (in R1): lig ig els -> delete; löst -> lös; fullt -> full
    m = _among_r1(w, r1, _SV_STEP3)
    if m in ("lig", "ig", "els"):
        w = w[: -len(m)]
    elif m in ("löst", "fullt"):
        w = w[:-1]
    return w


# ===========================================================================
# Norwegian (bokmål) — snowballstem.org/algorithms/norwegian/stemmer.html
# ===========================================================================

NORWEGIAN_STOP_WORDS = frozenset("""
og i jeg det at en et den til er som på de med han av ikke der så var
meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du ut
sin dem oss opp man kan hans hvor eller hva skal selv sjøl her alle vil
bli ble blei kunne inn når være kom noen noe ville dere deres kun ja
etter ned skulle denne for deg si sine sitt mot å meget hvorfor dette
disse uten hvordan ingen din ditt blir samme hvilken hvilke sånn inni
mellom vår hver hvem hvis både bare enn fordi før mange også slik vært
begge siden henne hennes
""".split())

_NO_VOWELS = frozenset("aeiouyæåø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")

_NO_STEP1 = sorted(
    """a e ede ande ende ane ene hetene en heten ar er heter as es edes
    endes enes hetenes ens hetens ers ets et het ast s erte ert""".split(),
    key=len, reverse=True,
)
_NO_PAIRS = ("dt", "vt")
_NO_STEP3 = sorted(
    "leg eleg ig eig lig elig els lov elov slov hetslov".split(),
    key=len, reverse=True,
)


def norwegian_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _NO_VOWELS)

    # step 1: delete group + conditional 's' + erte/ert -> er
    m = _among_r1(w, r1, _NO_STEP1)
    if m == "s":
        # valid s-ending: one of _NO_S_END, or 'k' not preceded by a vowel
        if len(w) >= 2 and (
            w[-2] in _NO_S_END
            or (w[-2] == "k" and (len(w) < 3 or w[-3] not in _NO_VOWELS))
        ):
            w = w[:-1]
    elif m in ("erte", "ert"):
        w = w[: len(w) - len(m)] + "er"
    elif m is not None:
        w = w[: -len(m)]

    # step 2: ends dt/vt with the whole pair inside R1 -> drop last letter
    if any(w.endswith(p) for p in _NO_PAIRS) and len(w) - 2 >= r1:
        w = w[:-1]

    # step 3 (in R1): delete
    m = _among_r1(w, r1, _NO_STEP3)
    if m is not None:
        w = w[: -len(m)]
    return w


# ===========================================================================
# Danish — snowballstem.org/algorithms/danish/stemmer.html
# ===========================================================================

DANISH_STOP_WORDS = frozenset("""
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os
op man hans hvor eller hvad skal selv her alle vil blev kunne ind når
være dog noget ville jo deres efter ned skulle denne end dette mit også
under have dig anden hende mine alt meget sit sine vor mod disse hvis
din nogle hos blive mange ad bliver hendes været thi jer sådan
""".split())

_DA_VOWELS = frozenset("aeiouyæåø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")

_DA_STEP1 = sorted(
    """hed ethed ered e erede ende erende ene erne ere en heden eren er
    heder erer heds es endes erendes enes ernes eres ens hedens erens
    ers ets erets et eret s""".split(),
    key=len, reverse=True,
)
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_STEP3 = sorted(["ig", "lig", "elig", "els", "løst"], key=len, reverse=True)


def _da_consonant_pair(w: str, r1: int) -> str:
    # the whole pair must lie inside R1 (setlimit brackets both chars)
    if any(w.endswith(p) for p in _DA_PAIRS) and len(w) - 2 >= r1:
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word.lower()
    r1 = _scand_r1(w, _DA_VOWELS)

    # step 1: main suffix among (delete), 's' conditional on valid s-ending
    m = _among_r1(w, r1, _DA_STEP1)
    if m == "s":
        if len(w) >= 2 and w[-2] in _DA_S_END:
            w = w[:-1]
    elif m is not None:
        w = w[: -len(m)]

    # step 2: consonant pair in R1 -> drop last letter
    w = _da_consonant_pair(w, r1)

    # step 3: 'igst' -> remove the final 'st' (not R1-limited), then the
    # R1 among: ig/lig/elig/els delete + repeat step 2; løst -> løs
    if w.endswith("igst"):
        w = w[:-2]
    m = _among_r1(w, r1, _DA_STEP3)
    if m == "løst":
        w = w[:-1]
    elif m is not None:
        w = w[: -len(m)]
        w = _da_consonant_pair(w, r1)

    # step 4 (undouble): word ends a double consonant in R1 -> drop one
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _DA_VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w


# ===========================================================================
# Analyzers (CreateComponents parity: tokenizer -> lower -> stop -> stem)
# ===========================================================================

class SwedishAnalyzer(_SnowballAnalyzer):
    """Analysis/Sv/SwedishAnalyzer.cs analogue (Snowball stop set + stem)."""

    _stem = staticmethod(swedish_stem)

    def __init__(self, stopwords=SWEDISH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class NorwegianAnalyzer(_SnowballAnalyzer):
    """Analysis/No/NorwegianAnalyzer.cs analogue (bokmål Snowball)."""

    _stem = staticmethod(norwegian_stem)

    def __init__(self, stopwords=NORWEGIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class DanishAnalyzer(_SnowballAnalyzer):
    """Analysis/Da/DanishAnalyzer.cs analogue (Snowball stop set + stem)."""

    _stem = staticmethod(danish_stem)

    def __init__(self, stopwords=DANISH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
