"""Rule-traced fixture pairs for the Portuguese / Italian / Dutch Snowball
stemmers (snowball_more.py), following the test_snowball.py pattern: each
pair hand-traced through the published algorithm description, exercising a
specific rule."""

import pytest

from lucenenet_spark.analysis.snowball_more import (
    dutch_stem,
    italian_stem,
    portuguese_stem,
)

# (word, stem, rule exercised)
PT_PAIRS = [
    ("bondade", "bondad", "step 5 final e in RV"),
    ("felicidade", "felic", "step 1 idade in R2 (ic kept, not in R2)"),
    ("amoroso", "amor", "step 1 oso delete in R2"),
    ("amorosas", "amor", "step 1 osas (longest match) delete in R2"),
    ("falaram", "fal", "step 2 aram verb suffix in RV"),
    ("falariam", "fal", "step 2 ariam in RV"),
    ("canção", "cançã", "a~ marking + step 4 residual o"),
    ("canções", "cançõ", "o~ marking + step 2/4 residual"),
    ("nacionalização", "nacionaliz", "step 1 aça~o delete in R2"),
    ("considerando", "consider", "step 2 ando in RV"),
    ("comendo", "com", "step 2 endo in RV"),
    ("dormindo", "dorm", "step 2 indo in RV"),
    ("atualmente", "atual", "step 1 mente delete in R2"),
    ("felizmente", "feliz", "step 1 mente"),
    ("lógica", "lógic", "step 4 residual a in RV"),
    ("proposta", "propost", "step 4 residual a"),
    ("chegue", "cheg", "step 5 e + gu undouble in RV"),
    ("ar", "ar", "too short for RV rules"),
]

IT_PAIRS = [
    ("abbandonata", "abbandon", "step 2 ata in RV"),
    ("abbandonate", "abbandon", "step 2 ate"),
    ("pronto", "pront", "step 3a final vowel in RV"),
    ("pronti", "pront", "step 3a final i"),
    ("generosità", "generos", "step 1 ità in R2"),
    ("mangiandolo", "mang", "step 0 pronoun after ando + step 2"),
    ("leggendolo", "legg", "step 0 pronoun after endo + step 2"),
    ("nazionalizzazione", "nazionalizz", "step 1 azione in R2"),
    ("abilità", "abil", "step 1 ità (abil prefix not in R2)"),
    ("ragione", "ragion", "step 3a final e"),
    ("crocchi", "crocc", "step 3a final i (crocchi->crocch) then 3b ch->c"),
    ("occhi", "occhi", "RV empty (vowel+consonant start): untouched"),
    ("quadro", "quadr", "qu marking: U not a vowel"),
    ("parlare", "parl", "step 2 are in RV"),
    ("parlerò", "parl", "step 2 erò"),
]

NL_PAIRS = [
    ("lichamelijk", "licham", "step 3b lijk + repeat step 2"),
    ("mogelijkheden", "mogelijk", "step 1 heden->heid + step 3a heid (lijk blocked: not in R2)"),
    ("bomen", "bom", "step 1b en after non-vowel in R1"),
    ("lopen", "lop", "step 1b en"),
    ("boot", "bot", "step 4 undouble vowel CVVD"),
    ("aardappelen", "aardappel", "step 1b en"),
    ("appeltjes", "appeltjes", "s after j is not a valid s-ending"),
    ("huizen", "huiz", "step 1b en"),
    ("duidelijk", "duidelijk", "lijk starts before R2: untouched"),
    ("kleine", "klein", "step 2 final e after non-vowel in R1"),
    ("katten", "kat", "step 1b en + undouble tt"),
    ("bedden", "bed", "step 1b en + undouble dd"),
]


@pytest.mark.parametrize("word,expected,rule", PT_PAIRS)
def test_portuguese_pairs(word, expected, rule):
    assert portuguese_stem(word) == expected, rule


@pytest.mark.parametrize("word,expected,rule", IT_PAIRS)
def test_italian_pairs(word, expected, rule):
    assert italian_stem(word) == expected, rule


@pytest.mark.parametrize("word,expected,rule", NL_PAIRS)
def test_dutch_pairs(word, expected, rule):
    assert dutch_stem(word) == expected, rule


def test_stemmers_idempotent_safe_on_garbage():
    for fn in (portuguese_stem, italian_stem, dutch_stem):
        for junk in ("", "a", "xy", "1234", "çãõ", "...", "ß"):
            out = fn(junk)  # must never raise
            assert isinstance(out, str)


def test_routed_analyzers_chain(spark):
    """pt/it/nl analyzers: stop words dropped, stems applied, positions
    keep holes (StandardAnalyzer chain semantics)."""
    from lucenenet_spark.analysis.snowball_more import (
        DutchAnalyzer,
        ItalianAnalyzer,
        PortugueseAnalyzer,
    )

    pt = PortugueseAnalyzer()
    toks = pt.tokenize_text("a bondade de amoroso")
    # 'a' and 'de' are pt stop words; holes preserved
    assert [(t, p) for t, p in toks] == [("bondad", 1), ("amor", 3)]

    it = ItalianAnalyzer()
    toks = it.tokenize_text("la generosità di pronto")
    assert [(t, p) for t, p in toks] == [("generos", 1), ("pront", 3)]

    nl = DutchAnalyzer()
    toks = nl.tokenize_text("de bomen en boot")
    assert [(t, p) for t, p in toks] == [("bom", 1), ("bot", 3)]
