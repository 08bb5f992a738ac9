"""Snowball Turkish stemmer + TurkishAnalyzer stop set.

Reimplements the PUBLISHED Snowball Turkish algorithm (Evren Kapusuz
Çilden, snowballstem.org/algorithms/turkish/stemmer.html) the reference
compiles from — Analysis/Tr/TurkishAnalyzer.cs (StandardTokenizer ->
ApostropheFilter -> TurkishLowerCaseFilter -> Stop -> SnowballFilter);
stemmer semantics specified by Tartarus/Snowball/Ext/TurkishStemmer.cs.
Among tables live in snowball_data.py (TR_A0..TR_A23).

Semantics notes (traced from the generated program):

- Every suffix "mark" moves a cursor without slicing; slices happen at
  explicit `] delete` points, so a slice can remove a MID-word region
  while a previously stripped tail stays (ki-chain recursion), and a
  suffix is removed together with everything marked after it (e.g. DA
  deletes its DA **and** the ki the chain entered through).
- check_vowel_harmony compares the last vowel before the cursor with
  the vowel before it (classes a/ı/o/u vs e/i/ö/ü etc.); it runs BEFORE
  the among, i.e. between the suffix's own vowel and the stem's last.
- The optional-consonant markers (n/s/y): if the char before the
  cursor IS the consonant it must be vowel-preceded (and is consumed);
  if it is NOT, the char two back must still be a vowel (cursor
  unmoved) — both facts verified against the generated branches. The
  optional-U marker is the same shape with U = ı/i/u/ü and a
  NON-vowel look-behind.
- SnowballFilter.cs ignores Stem()'s return value and always takes the
  stemmer's buffer, so mutations before a "failing" step are kept:
  continue_stemming=false (the nominal lAr branch) keeps the lAr
  deletion but skips noun suffixes AND the postlude, and the reserved
  words ad/soyad skip only the postlude transforms (preventing
  ad -> adı), not the suffix stripping that produced them.
- Words with fewer than two vowels are returned unchanged
  (more_than_one_syllable_word gate).
- The reference's ApostropheFilter truncates a token at its first
  apostrophe; this tokenizer splits on apostrophes instead (same
  documented approach as French/Catalan/Irish), so "türkiye'de" yields
  the extra token "de" (a stop word) rather than nothing.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _SnowballAnalyzer
from lucenenet_spark.analysis.snowball_data import (
    TR_A0, TR_A1, TR_A2, TR_A3, TR_A4, TR_A5, TR_A6, TR_A7, TR_A8,
    TR_A9, TR_A10, TR_A11, TR_A12, TR_A13, TR_A14, TR_A15, TR_A16,
    TR_A17, TR_A18, TR_A19, TR_A20, TR_A21, TR_A22,
)

_VOWEL = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}


def _strings(table):
    return tuple(s for s, _ in table)


(A0, A1, A2, A3, A4, A5, A6, A7, A8, A9, A10, A11, A12, A13, A14, A15,
 A16, A17, A18, A19, A20, A21, A22) = map(_strings, (
    TR_A0, TR_A1, TR_A2, TR_A3, TR_A4, TR_A5, TR_A6, TR_A7, TR_A8,
    TR_A9, TR_A10, TR_A11, TR_A12, TR_A13, TR_A14, TR_A15, TR_A16,
    TR_A17, TR_A18, TR_A19, TR_A20, TR_A21, TR_A22,
))


def _harmony(w: str, c: int) -> bool:
    i = c - 1
    while i >= 0 and w[i] not in _VOWEL:
        i -= 1
    if i < 0:
        return False
    cls = _HARMONY[w[i]]
    j = i - 1
    while j >= 0 and w[j] not in _VOWEL:
        j -= 1
    return j >= 0 and w[j] in cls


def _among(w: str, c: int, table) -> int | None:
    head = w[:c]
    for s in table:
        if head.endswith(s):
            return c - len(s)
    return None


def _opt_cons(w: str, c: int, ch: str) -> int | None:
    if c >= 1 and w[c - 1] == ch:
        return c - 1 if (c >= 2 and w[c - 2] in _VOWEL) else None
    return c if (c >= 2 and w[c - 2] in _VOWEL) else None


def _opt_u(w: str, c: int) -> int | None:
    if c >= 1 and w[c - 1] in _U:
        return c - 1 if (c >= 2 and w[c - 2] not in _VOWEL) else None
    return c if (c >= 2 and w[c - 2] not in _VOWEL) else None


# --- mark functions: (w, c) -> new cursor or None --------------------------

def _seq(w, c, *, harmony=False, table=None, u=False, cons=None, lit=None):
    if harmony and not _harmony(w, c):
        return None
    if lit is not None:
        if not w[:c].endswith(lit):
            return None
        c = c - len(lit)
    if table is not None:
        c = _among(w, c, table)
        if c is None:
            return None
    if u:
        if c < 1 or w[c - 1] not in _U:
            return None
        c -= 1
    if cons is not None:
        c = _opt_cons(w, c, cons)
    return c


def m_possessives(w, c):
    c = _among(w, c, A0)
    return None if c is None else _opt_u(w, c)


def m_sU(w, c):    return _seq(w, c, harmony=True, u=True, cons="s")
def m_lArI(w, c):  return _among(w, c, A1)
def m_yU(w, c):    return _seq(w, c, harmony=True, u=True, cons="y")
def m_nU(w, c):    return _seq(w, c, harmony=True, table=A2)
def m_nUn(w, c):   return _seq(w, c, harmony=True, table=A3, cons="n")
def m_yA(w, c):    return _seq(w, c, harmony=True, table=A4, cons="y")
def m_nA(w, c):    return _seq(w, c, harmony=True, table=A5)
def m_DA(w, c):    return _seq(w, c, harmony=True, table=A6)
def m_ndA(w, c):   return _seq(w, c, harmony=True, table=A7)
def m_DAn(w, c):   return _seq(w, c, harmony=True, table=A8)
def m_ndAn(w, c):  return _seq(w, c, harmony=True, table=A9)
def m_ylA(w, c):   return _seq(w, c, harmony=True, table=A10, cons="y")
def m_ki(w, c):    return c - 2 if w[:c].endswith("ki") else None
def m_ncA(w, c):   return _seq(w, c, harmony=True, table=A11, cons="n")
def m_yUm(w, c):   return _seq(w, c, harmony=True, table=A12, cons="y")
def m_sUn(w, c):   return _seq(w, c, harmony=True, table=A13)
def m_yUz(w, c):   return _seq(w, c, harmony=True, table=A14, cons="y")
def m_sUnUz(w, c): return _among(w, c, A15)
def m_lAr(w, c):   return _seq(w, c, harmony=True, table=A16)
def m_nUz(w, c):   return _seq(w, c, harmony=True, table=A17)
def m_DUr(w, c):   return _seq(w, c, harmony=True, table=A18)
def m_cAsInA(w, c): return _among(w, c, A19)
def m_yDU(w, c):   return _seq(w, c, harmony=True, table=A20, cons="y")
def m_ysA(w, c):   return _seq(w, c, table=A21, cons="y")
def m_ymUs(w, c):  return _seq(w, c, harmony=True, table=A22, cons="y")
def m_yken(w, c):  return _seq(w, c, lit="ken", cons="y")


def _first(w, c, *marks):
    for m in marks:
        t = m(w, c)
        if t is not None:
            return t
    return None


# --- stem_nominal_verb_suffixes (turkish.sbl lines 311-328) ----------------

def _nominal_verb(w: str) -> tuple[str, bool]:
    """Returns (word, continue_stemming_noun_suffixes)."""
    n = len(w)
    # B1: (ymUs_ | yDU | ysA | yken) -> common delete
    t = _first(w, n, m_ymUs, m_yDU, m_ysA, m_yken)
    if t is not None:
        return w[:t], True
    # B2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|empty) ymUs_ -> common delete
    t = m_cAsInA(w, n)
    if t is not None:
        t2 = _first(w, t, m_sUnUz, m_lAr, m_yUm, m_sUn, m_yUz)
        t3 = m_ymUs(w, t2 if t2 is not None else t)
        if t3 is not None:
            return w[:t3], True
    # B3: lAr ] delete try([ DUr|yDU|ysA|ymUs_) unset continue; common del
    t = m_lAr(w, n)
    if t is not None:
        w2 = w[:t]
        t2 = _first(w2, len(w2), m_DUr, m_yDU, m_ysA, m_ymUs)
        return (w2 if t2 is None else w2[:t2]), False
    # B4: nUz (yDU | ysA) -> common delete
    t = m_nUz(w, n)
    if t is not None:
        t2 = _first(w, t, m_yDU, m_ysA)
        if t2 is not None:
            return w[:t2], True
    # B5: (sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_) -> common delete
    t = _first(w, n, m_sUnUz, m_yUz, m_sUn, m_yUm)
    if t is not None:
        w2 = w[:t]
        t2 = m_ymUs(w2, len(w2))
        return (w2 if t2 is None else w2[:t2]), True
    # B6: DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|empty) ymUs_) -> del
    t = m_DUr(w, n)
    if t is not None:
        w2 = w[:t]
        n2 = len(w2)
        t2 = _first(w2, n2, m_sUnUz, m_lAr, m_yUm, m_sUn, m_yUz)
        t3 = m_ymUs(w2, t2 if t2 is not None else n2)
        return (w2 if t3 is None else w2[:t3]), True
    return w, True


# --- stem_suffix_chain_before_ki (lines 332-357) ---------------------------

def _del(w: str, bra: int, ket: int) -> str:
    return w[:bra] + w[ket:]


def _chain_ki(w: str, c: int) -> tuple[str, bool]:
    ket = c
    c = m_ki(w, c)
    if c is None:
        return w, False
    # A: DA ] delete try([ (lAr ] del try(chain)) |
    #                      (poss ] del try([lAr ] del chain)) )
    t = m_DA(w, c)
    if t is not None:
        w = _del(w, t, ket)
        ket2 = t
        t2 = m_lAr(w, ket2)
        if t2 is not None:
            w = _del(w, t2, ket2)
            w, _ = _chain_ki(w, t2)
            return w, True
        t2 = m_possessives(w, ket2)
        if t2 is not None:
            w = _del(w, t2, ket2)
            t3 = m_lAr(w, t2)
            if t3 is not None:
                w = _del(w, t3, t2)
                w, _ = _chain_ki(w, t3)
        return w, True
    # B: nUn ] delete try([ (lArI ] del) |
    #       ([ (poss|sU) ] del try([lAr ] del chain)) | chain )
    t = m_nUn(w, c)
    if t is not None:
        w = _del(w, t, ket)
        ket2 = t
        t2 = m_lArI(w, ket2)
        if t2 is not None:
            return _del(w, t2, ket2), True
        t2 = _first(w, ket2, m_possessives, m_sU)
        if t2 is not None:
            w = _del(w, t2, ket2)
            t3 = m_lAr(w, t2)
            if t3 is not None:
                w = _del(w, t3, t2)
                w, _ = _chain_ki(w, t3)
            return w, True
        w, _ = _chain_ki(w, ket2)
        return w, True
    # C: ndA ( (lArI ] del) | (sU ] del try([lAr ] del chain)) | chain )
    t = m_ndA(w, c)
    if t is not None:
        t1 = m_lArI(w, t)
        if t1 is not None:
            return _del(w, t1, ket), True
        t1 = m_sU(w, t)
        if t1 is not None:
            w = _del(w, t1, ket)
            t2 = m_lAr(w, t1)
            if t2 is not None:
                w = _del(w, t2, t1)
                w, _ = _chain_ki(w, t2)
            return w, True
        w2, ok = _chain_ki(w, t)
        if ok:
            return w2, True
    return w, False


# --- stem_noun_suffixes (lines 361-412) ------------------------------------

def _noun_suffixes(w: str) -> str:
    n = len(w)
    # N1 (362): [lAr] delete try(chain)
    t = m_lAr(w, n)
    if t is not None:
        w = w[:t]
        w, _ = _chain_ki(w, len(w))
        return w
    # N2 (364): [ncA] delete try( ([lArI] del) |
    #   ([ (poss|sU) ] del try([lAr] del chain)) | ([lAr] del chain) )
    t = m_ncA(w, n)
    if t is not None:
        w = w[:t]
        n2 = len(w)
        t2 = m_lArI(w, n2)
        if t2 is not None:
            return w[:t2]
        t2 = _first(w, n2, m_possessives, m_sU)
        if t2 is not None:
            w = w[:t2]
            t3 = m_lAr(w, t2)
            if t3 is not None:
                w = w[:t3]
                w, _ = _chain_ki(w, len(w))
            return w
        t2 = m_lAr(w, n2)
        if t2 is not None:
            w2 = w[:t2]
            w2, ok = _chain_ki(w2, len(w2))
            if ok:
                return w2
        return w
    # N3 (374): [(ndA|nA) ( (lArI ] del) | (sU ] del try([lAr] del chain))
    #                       | chain )]
    t = _first(w, n, m_ndA, m_nA)
    if t is not None:
        t1 = m_lArI(w, t)
        if t1 is not None:
            return w[:t1]
        t1 = m_sU(w, t)
        if t1 is not None:
            w = w[:t1]
            t2 = m_lAr(w, t1)
            if t2 is not None:
                w = w[:t2]
                w, _ = _chain_ki(w, len(w))
            return w
        w2, ok = _chain_ki(w, t)
        if ok:
            return w2
    # N4 (384): [(ndAn|nU) ( (sU ] del try([lAr] del chain)) | lArI )]
    t = _first(w, n, m_ndAn, m_nU)
    if t is not None:
        t1 = m_sU(w, t)
        if t1 is not None:
            w = w[:t1]
            t2 = m_lAr(w, t1)
            if t2 is not None:
                w = w[:t2]
                w, _ = _chain_ki(w, len(w))
            return w
        if m_lArI(w, t) is not None:
            return w      # marked but never sliced (published quirk)
    # N5 (386): [DAn] del try([ (poss ] del try([lAr] del chain)) |
    #                           (lAr ] del try(chain)) | chain )
    t = m_DAn(w, n)
    if t is not None:
        w = w[:t]
        n2 = len(w)
        t2 = m_possessives(w, n2)
        if t2 is not None:
            w = w[:t2]
            t3 = m_lAr(w, t2)
            if t3 is not None:
                w = w[:t3]
                w, _ = _chain_ki(w, len(w))
            return w
        t2 = m_lAr(w, n2)
        if t2 is not None:
            w = w[:t2]
            w, _ = _chain_ki(w, len(w))
            return w
        w, _ = _chain_ki(w, n2)
        return w
    # N6 (396): [(nUn|ylA)] del try( ([lAr] del chain) |
    #   ([(poss|sU)] del try([lAr] del chain)) | chain )
    t = _first(w, n, m_nUn, m_ylA)
    if t is not None:
        w = w[:t]
        n2 = len(w)
        t2 = m_lAr(w, n2)
        if t2 is not None:
            w2 = w[:t2]
            w2, ok = _chain_ki(w2, len(w2))
            if ok:
                return w2
        t2 = _first(w, n2, m_possessives, m_sU)
        if t2 is not None:
            w = w[:t2]
            t3 = m_lAr(w, t2)
            if t3 is not None:
                w = w[:t3]
                w, _ = _chain_ki(w, len(w))
            return w
        w2, ok = _chain_ki(w, n2)
        return w2 if ok else w
    # N7 (406): [lArI] delete
    t = m_lArI(w, n)
    if t is not None:
        return w[:t]
    # N8 (408): chain at the word end
    w2, ok = _chain_ki(w, n)
    if ok:
        return w2
    # N9 (410): [(DA|yU|yA)] del try([ ((poss ] del try([lAr)) | lAr)
    #                                  ] del [ chain )
    t = _first(w, n, m_DA, m_yU, m_yA)
    if t is not None:
        w = w[:t]
        n2 = len(w)
        t2 = m_possessives(w, n2)
        if t2 is not None:
            w = w[:t2]
            t3 = m_lAr(w, t2)        # marked inside try, sliced by the
            ket = t2                 # common ] delete below
            bra = t3 if t3 is not None else ket
            w = _del(w, bra, ket)
            w, _ = _chain_ki(w, len(w))
            return w
        t2 = m_lAr(w, n2)
        if t2 is not None:
            w = w[:t2]
            w, _ = _chain_ki(w, len(w))
        return w
    # N10 (412): [(poss|sU)] del try([lAr] del chain)
    t = _first(w, n, m_possessives, m_sU)
    if t is not None:
        w = w[:t]
        t2 = m_lAr(w, t)
        if t2 is not None:
            w = w[:t2]
            w, _ = _chain_ki(w, len(w))
        return w
    return w


# --- postlude + driver -----------------------------------------------------

_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def _append_u(w: str) -> str:
    if not w or w[-1] not in "dg":
        return w
    for ch in reversed(w):
        if ch in _VOWEL:
            if ch in "aı":
                return w + "ı"
            if ch in "ei":
                return w + "i"
            if ch in "ou":
                return w + "u"
            return w + "ü"
    return w


def turkish_stem(word: str) -> str:
    """Tartarus/Snowball/Ext/TurkishStemmer.cs semantics (buffer-keeping
    per SnowballFilter.cs:102-112)."""
    w = word
    if sum(ch in _VOWEL for ch in w) < 2:
        return w
    w, cont = _nominal_verb(w)
    if not cont:
        return w
    w = _noun_suffixes(w)
    if w in ("ad", "soyad"):
        return w
    w = _append_u(w)
    if w and w[-1] in _DEVOICE:
        w = w[:-1] + _DEVOICE[w[-1]]
    return w


# --- analyzer --------------------------------------------------------------

TURKISH_STOP_WORDS = frozenset("""
acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki ben
benden beni benim beri beş bile bin bir birçok biri birkaç birkez
birşey birşeyi biz bize bizden bizi bizim böyle böylece bu buna bunda
bundan bunlar bunları bunların bunu bunun burada çok çünkü da daha
dahi de defa değil diğer diye doksan dokuz dolayı dolayısıyla dört
edecek eden ederek edilecek ediliyor edilmesi ediyor eğer elli en
etmesi etti ettiği ettiğini gibi göre halen hangi hatta hem henüz hep
hepsi her herhangi herkesin hiç hiçbir için iki ile ilgili ise işte
itibaren itibariyle kadar karşın katrilyon kendi kendilerine kendini
kendisi kendisine kendisini kez ki kim kimden kime kimi kimse kırk
milyar milyon mu mü mı nasıl ne neden nedenle nerde nerede nereye niye
niçin o olan olarak oldu olduğu olduğunu olduklarını olmadı olmadığı
olmak olması olmayan olmaz olsa olsun olup olur olursa oluyor on ona
ondan onlar onlardan onları onların onu onun otuz oysa öyle pek rağmen
sadece sanki sekiz seksen sen senden seni senin siz sizden sizi sizin
şey şeyden şeyi şeyler şöyle şu şuna şunda şundan şunları şunu
tarafından trilyon tüm üç üzere var vardı ve veya ya yani yapacak
yapılan yapılması yapıyor yapmak yaptı yaptığı yaptığını yaptıkları
yedi yerine yetmiş yine yirmi yoksa yüz zaten
""".split())

_TR_CASEFOLD = str.maketrans({"İ": "i", "I": "ı"})


class TurkishAnalyzer(_SnowballAnalyzer):
    """Analysis/Tr/TurkishAnalyzer.cs analogue. TurkishLowerCaseFilter's
    dotted/dotless-i rule is applied as a pre-lowercase text map
    (İ->i, I->ı, and the i+combining-dot sequence folded to i);
    ApostropheFilter deviation documented in the module docstring."""

    _stem = staticmethod(turkish_stem)

    def __init__(self, stopwords=TURKISH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)

    def tokenize_batch(self, texts):
        texts = (
            texts.fillna("").astype(str)
            .str.translate(_TR_CASEFOLD)
            .str.replace("i̇", "i", regex=False)
        )
        return super().tokenize_batch(texts)
