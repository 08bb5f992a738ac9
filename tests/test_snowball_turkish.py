"""Rule-traced fixture pairs for the Snowball Turkish pack.

Expected values are hand-traced through the published algorithm
(vowel-harmony classes, optional n/s/y/U markers, the nominal-verb
or-chain with its continue_stemming flag, the ki-chain's mid-word
slices, append-U + final devoicing) — same verification method as the
rest of the Snowball family tests.
"""

from lucenenet_spark.analysis.snowball_turkish import (
    TurkishAnalyzer,
    turkish_stem,
)

TR_PAIRS = [
    # nominal-verb lAr branch: strips lar and UNSETS continue_stemming,
    # so noun suffixes and the postlude are skipped
    ("kitaplar", "kitap", "nominal lAr; cont=false"),
    ("evimizdekiler", "evimizdeki", "nominal lAr fires FIRST and stops"
                                     " the noun/ki chain (reference flow)"),
    # noun suffixes
    ("kitabı", "kitap", "sU accusative; postlude devoices b->p"),
    ("evde", "ev", "DA locative with e/i harmony"),
    ("evlerde", "ev", "DA then lAr inside N9's try"),
    ("arabaya", "araba", "yA dative, optional y consumed (vowel stem)"),
    ("kitaplardan", "kitap", "DAn + lAr chain"),
    ("güzelliği", "güzellik", "sU; postlude devoices ğ->k"),
    # ki chain with mid-structure deletes
    ("ağaçlardaki", "ağaç", "chain: ki -> DA deletes daki -> lAr"),
    # verb: yUm strips, then append-U restores the harmonized vowel on
    # the d-final stem (postlude append_U)
    ("okudum", "okudu", "yUm; append u after d"),
    ("geliyorum", "geliyor", "yUm only; -iyor is never stripped"),
    # reserved words: suffix stripping happens, postlude is skipped
    # (ad would otherwise gain an appended ı)
    ("adlar", "ad", "reserved word skips append_U"),
    ("soyadından", "soyad", "reserved word skips append_U"),
    # gates
    ("ev", "ev", "single syllable: untouched"),
    ("ad", "ad", "single syllable"),
]


def test_turkish_fixture_pairs():
    bad = [(w, e, turkish_stem(w)) for w, e, _ in TR_PAIRS
           if turkish_stem(w) != e]
    assert not bad, bad


def test_vowel_harmony_blocks_suffix():
    # 'lar' after a front vowel fails harmony: 'evlar' is not harmonic
    # (e is front, a-suffix requires back) -> lAr must not match
    from lucenenet_spark.analysis.snowball_turkish import m_lAr
    assert m_lAr("evlar", 5) is None
    assert m_lAr("kitaplar", 8) is not None


def test_optional_y_consonant_semantics():
    # y present must be vowel-preceded; y absent needs vowel two back
    from lucenenet_spark.analysis.snowball_turkish import m_yA
    assert m_yA("arabaya", 7) == 5    # ...a[ya]: y consumed
    assert m_yA("eve", 3) == 2        # ev[e]: no y, e(0) is the look-behind
    assert m_yA("türka", 5) is None   # k before a, r two back: not vowel


def test_turkish_casefold():
    az = TurkishAnalyzer()
    toks = az.terms("KITAPLAR İki")
    # I -> ı (dotless), İ -> i; 'iki' is a stop word, kıtaplar stems
    assert "iki" not in toks
    assert any(t.startswith("k") and "ı" in t for t in toks)


def test_analyzer_stop_and_stem():
    az = TurkishAnalyzer()
    toks = az.terms("kitaplar ve evde")
    assert "ve" not in toks
    assert "kitap" in toks and "ev" in toks


def test_stemmer_noop_safe():
    for w in ["", "a", "ev", "b", "ğ"]:
        turkish_stem(w)
