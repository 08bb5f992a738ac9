"""Fixture pairs for the light-stemmer language packs (analysis/light.py).

Each pair is hand-traced through the published algorithm (references in
the module docstring); they pin rule ORDER and the minimum-remainder
guards, not just happy paths.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.light import (
    arabic_normalize,
    arabic_stem,
    bulgarian_stem,
    czech_stem,
    hindi_normalize,
    hindi_stem,
    indonesian_stem,
    persian_normalize,
    persian_stem,
)


# ---------------------------------------------------------------- Arabic
@pytest.mark.parametrize(
    "word,expected",
    [
        ("آمل", "امل"),          # alef madda -> alef
        ("أحمد", "احمد"),        # hamza above -> alef
        ("إسلام", "اسلام"),      # hamza below -> alef
        ("مكتبةـ", "مكتبه"),     # tatweel deleted, teh marbuta -> heh
        ("مُدَرِّس", "مدرس"),    # harakat deleted
        ("مستشفى", "مستشفي"),    # dotless yeh -> yeh
    ],
)
def test_arabic_normalize(word, expected):
    assert arabic_normalize(word) == expected


@pytest.mark.parametrize(
    "word,expected",
    [
        ("الكتاب", "كتاب"),      # definite article
        ("والكتاب", "كتاب"),     # wal- fusion (matched before bare waw)
        ("بالكتاب", "كتاب"),
        ("للعلم", "علم"),        # lil-
        ("وجد", "وجد"),          # waw prefix needs len>=4: len 3 keeps it
        ("وجدت", "جدت"),         # len 4: waw strips
        ("المعلمون", "معلم"),    # article + -uwn plural
        ("مكتبه", "مكتب"),       # heh suffix (normalized marbuta)
        ("الله", "له"),           # al- strips at exactly len 4 (guard is len < plen+2)
        ("كتابها", "كتاب"),      # -haa possessive
    ],
)
def test_arabic_stem(word, expected):
    assert arabic_stem(word) == expected


# ---------------------------------------------------------------- Persian
def test_persian_normalize_folds():
    assert persian_normalize("می") == "مي"          # farsi yeh -> yeh
    assert persian_normalize("کتاب") == "كتاب"      # keheh -> kaf
    assert persian_normalize("نامۀ") == "نامه"      # heh+yeh -> heh


@pytest.mark.parametrize(
    "word,expected",
    [
        ("كتابها", "كتاب"),      # -haa
        ("بهترين", "به"),        # -tariyn superlative (len 6 >= 4+2)
        ("كتابات", "كتاب"),      # -aat
        ("ميز", "ميز"),          # too short for -iy (needs 3)
    ],
)
def test_persian_stem(word, expected):
    assert persian_stem(word) == expected


# ---------------------------------------------------------------- Hindi
def test_hindi_normalize():
    assert hindi_normalize("लड़का") == "लडका"       # nukta deleted
    assert hindi_normalize("लडकियाँ") == "लडकियां"  # candrabindu -> anusvara
    assert hindi_normalize("ईद") == "इद"            # long I -> short
    assert hindi_normalize("क्या") == "कया"         # virama deleted


@pytest.mark.parametrize(
    "word,expected",
    [
        ("लडकियां", "लडक"),      # -iyaaM (4-char group, len 7 > 5)
        ("लडका", "लडक"),          # -aa (1-char group)
        ("खाना", "खा"),           # -naa (2-char group, len 4 > 3)
        ("बच", "बच"),             # len 2: no group fires
    ],
)
def test_hindi_stem(word, expected):
    assert hindi_stem(word) == expected


# ---------------------------------------------------------------- Indonesian
@pytest.mark.parametrize(
    "word,expected",
    [
        ("bukunya", "buku"),        # possessive -nya
        ("bukukah", "buku"),        # particle -kah
        ("membeli", "beli"),        # mem-
        ("mengukur", "ukur"),       # meng-
        ("menyapu", "sapu"),        # meny+V recodes to s
        ("penyaringan", "saring"),  # peny+V -> s, then -an (PENG allows -an)
        ("berlari", "lari"),        # ber- (second order)
        ("belajar", "ajar"),        # irregular bel-
        ("pelajar", "ajar"),        # irregular pel-
        ("kebijakan", "bijak"),     # ke- blocks -kan but allows -an? no:
                                    # ke- + -an both strip (flags block kan)
        ("makanan", "makan"),       # -an with no prefix flags
        ("duduk", "duduk"),         # 2 syllables: untouched
    ],
)
def test_indonesian_stem(word, expected):
    assert indonesian_stem(word) == expected


# ---------------------------------------------------------------- Czech
@pytest.mark.parametrize(
    "word,expected",
    [
        ("ženách", "žn"),        # -ách case, then e-elision normalize
        ("matkami", "matk"),     # -ami
        ("otázkou", "otázk"),    # -ou
        ("práci", "prák"),       # -i vowel, then c -> k palatalization
        ("pražští", "pražsk"),   # -í vowel, then št -> sk palatalization
        ("otcův", "otcov"),      # possessive needs len>5; ů -> o recoding
    ],
)
def test_czech_stem(word, expected):
    assert czech_stem(word) == expected


# ---------------------------------------------------------------- Bulgarian
@pytest.mark.parametrize(
    "word,expected",
    [
        ("градовете", "град"),   # article -те, plural -ове
        ("книгата", "книг"),     # article -та, trailing -а
        ("ученици", "ученик"),   # -ци -> к recoding
        ("дом", "дом"),          # len < 4: untouched
    ],
)
def test_bulgarian_stem(word, expected):
    assert bulgarian_stem(word) == expected


# ---------------------------------------------------------------- Latvian
from lucenenet_spark.analysis.light import latvian_stem, sorani_normalize, sorani_stem


@pytest.mark.parametrize(
    "word,expected",
    [
        ("cilvēks", "cilvēk"),   # -s (vc 0)
        ("latviešu", "latvieš"), # -u palatalizing, no recoding applies
        ("valodas", "valod"),    # -as
        ("ceļu", "cel"),         # -u, then ļ -> l unpalatalization
        ("tas", "tas"),          # 1 vowel: -as needs vc>1, -s leaves 2 chars
    ],
)
def test_latvian_stem(word, expected):
    assert latvian_stem(word) == expected


# ---------------------------------------------------------------- Sorani
def test_sorani_normalize():
    assert sorani_normalize("كتاب") == "کتاب"      # kaf -> keheh
    assert sorani_normalize("ماله") == "مالە"      # final heh -> ae
    assert sorani_normalize("رەش") == "ڕەش"        # initial reh -> rreh
    assert sorani_normalize("ئێستاي") == "ئێستای"  # yeh -> farsi yeh


@pytest.mark.parametrize(
    "word,expected",
    [
        ("پیاوەکان", "پیاو"),    # definite plural -ekan
        ("کتێبێک", "کتێب"),      # indefinite -êk
        ("شارەکە", "شارە"),      # len 6: -ەکە needs len>6, falls to -کە
        ("پیاوەکە", "پیاو"),     # len 7: definite -ەکە strips
        ("شاردا", "شاردا"),      # postposition -دا needs len>5: keeps
        ("باخچەدا", "باخچ"),     # -دا strips, then final -ە also strips
    ],
)
def test_sorani_stem(word, expected):
    assert sorani_stem(word) == expected
