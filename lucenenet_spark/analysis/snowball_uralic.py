"""Snowball stemmers + stop sets: Finnish, Hungarian.

Reimplements the PUBLISHED Snowball algorithms
(snowballstem.org/algorithms/{finnish,hungarian}/stemmer.html) the
reference compiles from — Analysis/Fi/FinnishAnalyzer.cs and
Analysis/Hu/HungarianAnalyzer.cs (each: StandardTokenizer -> LowerCase
-> Stop -> SnowballFilter); stemmer semantics specified by
Tartarus/Snowball/Ext/{Finnish,Hungarian}Stemmer.cs. Among tables live
in snowball_data.py.

Semantics notes (traced from the generated programs):

- Finnish amongs run under setlimit-to-R1 (or R2) — a candidate suffix
  extending before the limit is not a match and matching falls back to
  shorter entries — but each ACTION's look-behind condition runs with
  the limit RESTORED (unrestricted). Among-level conditions (the VI /
  LONG guards on den/seen/tten/siin) are the one exception: they are
  evaluated during matching, under the limit, and a failure falls back
  through the substring chain (e.g. seen -> n).
- Finnish possessive 'ni': the deletion commits even when the follow-up
  kse->ksi rewrite does not apply (Snowball slice-then-fail behavior).
- Hungarian R1: if the word starts with a vowel, R1 begins after the
  first consonant run's FIRST consonant — unless a digraph (cs gy ly ny
  sz ty zs dzs) starts there, in which case after the digraph; if it
  starts with a consonant, after the first vowel.
- The reference's 4.8-era Hungarian data tables encode ő as Latin-1 õ
  (U+00F5, a transcoding artifact of the Latin-2 Snowball source); this
  port restores the proper Unicode forms ő/ű, matching the published
  algorithm.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer
from lucenenet_spark.analysis.snowball_data import (
    FI_A0,
    FI_A1,
    FI_A2,
    FI_A3,
    FI_A4,
    FI_A6,
    FI_A7,
    HU_A0,
    HU_A1,
    HU_A2,
    HU_A3,
    HU_A4,
    HU_A5,
    HU_A6,
    HU_A7,
    HU_A8,
    HU_A9,
    HU_A10,
    HU_A11,
)
from lucenenet_spark.analysis.snowball_romance2 import _longest

# ===========================================================================
# Finnish
# ===========================================================================

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_PARTICLE_END = _FI_V1 | {"n", "t"}
_FI_LONG = {"aa", "ee", "ii", "oo", "uu", "ää", "öö"}


def _fi_r_after(w: str, start: int) -> int:
    """Position after the first non-vowel following a vowel (standard R)."""
    n = len(w)
    i = start
    while i < n and w[i] not in _FI_V1:
        i += 1
    while i < n and w[i] in _FI_V1:
        i += 1
    # i now at first non-vowel after a vowel (or end)
    return i + 1 if i < n else n


def _fi_particle(w: str, r1: int, r2: int) -> str:
    s, code = _longest(w, FI_A0, limit=r1)
    if not s:
        return w
    pos = len(w) - len(s)
    if code == 1:
        if pos >= 1 and w[pos - 1] in _FI_PARTICLE_END:
            return w[:pos]
        return w
    # code 2: 'sti' in R2
    if pos >= r2:
        return w[:pos]
    return w


_FI_AN_PRE = [s for s, _ in FI_A1]   # lla na ssa ta lta sta
_FI_AEN_PRE = [s for s, _ in FI_A2]  # llä nä ssä tä ltä stä
_FI_EN_PRE = [s for s, _ in FI_A3]   # lle ine


def _fi_possessive(w: str, r1: int) -> str:
    s, code = _longest(w, FI_A4, limit=r1)
    if not s:
        return w
    pos = len(w) - len(s)
    head = w[:pos]
    if code == 1:      # si, not preceded by k
        return head if not head.endswith("k") else w
    if code == 2:      # ni; then kse -> ksi
        if head.endswith("kse"):
            return head[:-3] + "ksi"
        return head
    if code == 3:      # nsa nsä mme nne
        return head
    if code == 4:      # an, preceded by lla/na/ssa/ta/lta/sta
        return head if any(head.endswith(p) for p in _FI_AN_PRE) else w
    if code == 5:      # än, preceded by llä/nä/ssä/tä/ltä/stä
        return head if any(head.endswith(p) for p in _FI_AEN_PRE) else w
    # code 6: en, preceded by lle/ine
    return head if any(head.endswith(p) for p in _FI_EN_PRE) else w


_FI_HXN = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}


def _fi_case_match(w: str, r1: int):
    """a_6 under setlimit-R1 with among-level VI/LONG conditions: a
    failing condition falls back to shorter entries (substring chain)."""
    n = len(w)
    for s, code, cond in FI_A6:
        pos = n - len(s)
        if pos < r1 or not w.endswith(s):
            continue
        if cond == "VI":
            # preceded by i preceded by a V2 vowel, wholly within R1
            if pos - 2 >= r1 and w[pos - 1] == "i" and w[pos - 2] in _FI_V2:
                return s, code
            continue
        if cond == "LONG":
            if pos - 2 >= r1 and w[pos - 2:pos] in _FI_LONG:
                return s, code
            continue
        return s, code
    return None, 0


def _fi_case_ending(w: str, r1: int) -> tuple[str, bool]:
    s, code = _fi_case_match(w, r1)
    if not s:
        return w, False
    pos = len(w) - len(s)
    head = w[:pos]
    if code in _FI_HXN:  # hXn requires preceding literal X (unrestricted)
        if not head.endswith(_FI_HXN[code]):
            return w, False
        return head, True
    if code == 7:        # n; delete a preceding LONG-vowel half or ie's e
        if head[-2:] in _FI_LONG or head.endswith("ie"):
            return head[:-1], True
        return head, True
    if code == 8:        # a/ä preceded by consonant+vowel
        if (len(head) >= 2 and head[-1] in _FI_V1
                and head[-2] not in _FI_V1):
            return head, True
        return w, False
    if code == 9:        # tta/ttä preceded by e
        if head.endswith("e"):
            return head, True
        return w, False
    return head, True    # unconditional case endings (code -1)


def _fi_other_endings(w: str, r2: int) -> str:
    s, code = _longest(w, FI_A7, limit=r2)
    if not s:
        return w
    pos = len(w) - len(s)
    if code == 1 and w[:pos].endswith("po"):  # mpi family not after po
        return w
    return w[:pos]


def _fi_i_plural(w: str, r1: int) -> str:
    if len(w) > r1 and w[-1] in "ij":
        return w[:-1]
    return w


def _fi_t_plural(w: str, r1: int, r2: int) -> str:
    # the preceding-vowel test runs BEFORE the limit restore, so the
    # vowel itself must also lie in R1
    if len(w) - 2 >= r1 and w.endswith("t") and w[-2] in _FI_V1:
        w = w[:-1]
        # then mma (not after po) / imma in R2
        n = len(w)
        if w.endswith("imma") and n - 4 >= r2:
            return w[:-4]
        if w.endswith("mma") and n - 3 >= r2 and not w[:-3].endswith("po"):
            return w[:-3]
    return w


def _fi_tidy(w: str, r1: int) -> str:
    n = len(w)
    # (a) LONG vowel pair at the end, inside R1: shorten
    if n - 2 >= r1 and w[-2:] in _FI_LONG:
        w = w[:-1]
    # (b) trailing a/e/i/ä preceded by a consonant (both inside R1 —
    #     the look-behind runs under the still-active setlimit)
    if len(w) - 2 >= r1 and w[-1] in _FI_AEI and w[-2] not in _FI_V1:
        w = w[:-1]
    # (c) trailing oj / uj: drop the j (o/u must lie in R1 too)
    if len(w) - 2 >= r1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    # (d) trailing jo: drop the o (j must lie in R1 too)
    if len(w) - 2 >= r1 and w.endswith("jo"):
        w = w[:-1]
    # (e) unrestricted: undouble the LAST consonant if doubled
    #     (double consonant followed by zero or more vowels)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_V1:
        i -= 1
    if i >= 1 and w[i] not in _FI_V1 and w[i - 1] == w[i]:
        w = w[:i] + w[i + 1:]
    return w


def finnish_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/FinnishStemmer.cs semantics."""
    w = word
    r1 = _fi_r_after(w, 0)
    r2 = _fi_r_after(w, r1)
    w = _fi_particle(w, r1, r2)
    w = _fi_possessive(w, r1)
    w, ending_removed = _fi_case_ending(w, r1)
    w = _fi_other_endings(w, r2)
    if ending_removed:
        w = _fi_i_plural(w, r1)
    else:
        w = _fi_t_plural(w, r1, r2)
    return _fi_tidy(w, r1)


# ===========================================================================
# Hungarian
# ===========================================================================

_HU_VOWELS = frozenset("aeiouáéíóöúüőű")
_HU_DIGRAPHS = [s for s, _ in HU_A0]       # cs gy ly ny sz ty zs dzs
_HU_DOUBLES = [s for s, _ in HU_A2]        # bb cc ccs dd ff ... zzs


def _hu_r1(w: str) -> int:
    n = len(w)
    if not w:
        return 0
    if w[0] in _HU_VOWELS:
        # after the first consonant (or consonant digraph starting there)
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    # starts with a consonant: after the first vowel
    i = 1
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def _hu_double(head: str) -> bool:
    """Word (before the removed suffix) ends with a doubled consonant."""
    return any(head.endswith(d) for d in _HU_DOUBLES)


def _hu_undouble(head: str) -> str:
    """Remove the second-to-last character (undoubles kk/tt/ssz...)."""
    if len(head) < 2:
        return head
    return head[:-2] + head[-1]


def _hu_v_ending(w: str, r1: int) -> str:
    s, code = _longest(w, HU_A1)   # á é
    if s and len(w) - len(s) >= r1:
        return w[: len(w) - len(s)] + ("a" if code == 1 else "e")
    return w


def _hu_among_step(w: str, r1: int, among, actions) -> str:
    """Generic R1-checked among: actions maps code -> None (delete) or a
    replacement string. Longest match, no fallback on failed R1."""
    s, code = _longest(w, among)
    if not s:
        return w
    pos = len(w) - len(s)
    if pos < r1:
        return w
    repl = actions.get(code)
    return w[:pos] + (repl or "")


def _hu_instrum(w: str, r1: int) -> str:
    s, code = _longest(w, HU_A3)   # al el
    if not s:
        return w
    pos = len(w) - len(s)
    if pos < r1 or not _hu_double(w[:pos]):
        return w
    return _hu_undouble(w[:pos])


def _hu_factive(w: str, r1: int) -> str:
    s, code = _longest(w, HU_A7)   # á é
    if not s:
        return w
    pos = len(w) - len(s)
    if pos < r1 or not _hu_double(w[:pos]):
        return w
    return _hu_undouble(w[:pos])


def _hu_case(w: str, r1: int) -> str:
    s, _code = _longest(w, HU_A4)
    if s and len(w) - len(s) >= r1:
        w = w[: len(w) - len(s)]
        w = _hu_v_ending(w, r1)
    return w


_HU_CASE_SPECIAL = {1: "e", 2: "a", 3: "a"}           # én át ánként
_HU_CASE_OTHER = {1: None, 2: None, 3: "a", 4: "e"}   # astul estül ástul éstül
_HU_PLURAL = {1: "a", 2: "e", 3: None, 4: None, 5: None, 6: None, 7: None}
_HU_OWNED = {1: None, 2: "e", 3: "a", 4: None, 5: "e", 6: "a", 7: None,
             8: "e", 9: None}
_HU_SING_OWNER = {1: None, 2: "a", 3: "e", 4: None, 5: "a", 6: "e", 7: None,
                  8: None, 9: None, 10: "a", 11: "e", 12: None, 13: None,
                  14: "a", 15: "e", 16: None, 17: None, 18: None, 19: "a",
                  20: "e"}
_HU_PLUR_OWNER = {1: None, 2: "a", 3: "e", 4: None, 5: None, 6: None,
                  7: "a", 8: "e", 9: None, 10: None, 11: None, 12: "a",
                  13: "e", 14: None, 15: None, 16: None, 17: None, 18: "a",
                  19: "e", 20: None, 21: None, 22: "a", 23: "e", 24: None,
                  25: None, 26: None, 27: "a", 28: "e", 29: None}


def hungarian_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/HungarianStemmer.cs semantics: instrum,
    case, case_special, case_other, factive, owned, sing_owner,
    plur_owner, plural — each an independent `do` over the current word."""
    w = word
    r1 = _hu_r1(w)
    w = _hu_instrum(w, r1)
    w = _hu_case(w, r1)
    w = _hu_among_step(w, r1, HU_A5, _HU_CASE_SPECIAL)
    w = _hu_among_step(w, r1, HU_A6, _HU_CASE_OTHER)
    w = _hu_factive(w, r1)
    w = _hu_among_step(w, r1, HU_A9, _HU_OWNED)
    w = _hu_among_step(w, r1, HU_A10, _HU_SING_OWNER)
    w = _hu_among_step(w, r1, HU_A11, _HU_PLUR_OWNER)
    w = _hu_among_step(w, r1, HU_A8, _HU_PLURAL)
    return w


# ===========================================================================
# Stop sets (Snowball project lists, as shipped by the reference's
# Analysis/Snowball/{finnish,hungarian}_stop.txt)
# ===========================================================================

FINNISH_STOP_WORDS = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin teillä
teiltä teille he heidän heidät heitä heissä heistä heihin heillä heiltä
heille tämä tämän tätä tässä tästä tähän tällä tältä tälle tänä täksi
tuo tuon tuota tuossa tuosta tuohon tuolla tuolta tuolle tuona tuoksi
se sen sitä siinä siitä siihen sillä siltä sille sinä siksi nämä näiden
näitä näissä näistä näihin näillä näiltä näille näinä näiksi nuo noiden
noita noissa noista noihin noilla noilta noille noina noiksi ne niiden
niitä niissä niistä niihin niillä niiltä niille niinä niiksi kuka kenen
kenet ketä kenessä kenestä keneen kenellä keneltä kenelle kenenä keneksi
ketkä keiden ketkä keitä keissä keistä keihin keillä keiltä keille keinä
keiksi mikä minkä minkä mitä missä mistä mihin millä miltä mille minä
miksi mitkä joka jonka jota jossa josta johon jolla jolta jolle jona
joksi jotka joiden joita joissa joista joihin joilla joilta joille joina
joiksi että ja jos koska kuin mutta niin sekä sillä tai vaan vai vaikka
kanssa mukaan noin poikki yli kun niin nyt itse
""".split())

HUNGARIAN_STOP_WORDS = frozenset("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill.
ill ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
keressünk ki kívül között közül legalább lehet lehetett legyen lenne
lenni lesz lett maga magát majd már más másik meg még mellett mert mely
melyek mi mit míg miért milyen mikor minden mindent mindenki mindig
mint mintha mivel most nagy nagyobb nagyon ne néha nekem neki nem
néhány nélkül nincs olyan ott össze ő ők őket pedig persze rá s saját
sem semmi sok sokat sokkal számára szemben szerint szinte talán tehát
teljes tovább továbbá több úgy ugyanis új újabb újra után utána utolsó
vagy vagyis valaki valami valamint való vagyok van vannak volt voltam
voltak voltunk vissza vele viszont volna
""".split())


class FinnishAnalyzer(_SnowballAnalyzer):
    """Analysis/Fi/FinnishAnalyzer.cs analogue (stop set + Snowball
    Finnish)."""

    _stem = staticmethod(finnish_stem)

    def __init__(self, stopwords=FINNISH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


class HungarianAnalyzer(_SnowballAnalyzer):
    """Analysis/Hu/HungarianAnalyzer.cs analogue (stop set + Snowball
    Hungarian)."""

    _stem = staticmethod(hungarian_stem)

    def __init__(self, stopwords=HUNGARIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
