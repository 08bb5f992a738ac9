"""Fixture tests for the RSLP engine (Galician/Portuguese) and the
Brazilian stemmer.

RSLP expectations follow the published rule data (first matching rule
per step, step flow per stemmer); Brazilian expectations are traced
through the extracted Step1/Step2 tables + the Step3-5 driver.
"""

from lucenenet_spark.analysis.brazilian import (
    BrazilianAnalyzer,
    _brazilian_token_stem,
    brazilian_stem,
)
from lucenenet_spark.analysis.rslp import (
    GalicianAnalyzer,
    galician_minimal_stem,
    galician_stem,
    portuguese_rslp_stem,
)
from lucenenet_spark.analysis.snowball_data import BR_STEP1, BR_STEP2

GL_PAIRS = [
    ("bons", "bon", "plural ns->n"),
    ("luces", "luz", "plural ces->z"),
    ("mellores", "mellor", "plural res->r; noun keeps mellor"),
    ("belamente", "bel", "adverb mente + vowel"),
    ("casas", "cas", "plural s + vowel a"),
]

GL_MIN_PAIRS = [
    ("bons", "bon"), ("luces", "luz"), ("casas", "casa"),
    ("belamente", "belamente"),
]

PT_PAIRS = [
    ("meninos", "menin", "plural + vowel"),
    ("felizmente", "feliz", "adverb"),
    ("falamos", "fal", "verb amos"),
]

BR_PAIRS = [
    ("meninas", "menin", "step2/4 strip as"),
    ("felizmente", "feliz", "mente R1 rule"),
    ("cachorros", "cachorr", "plural-ish os"),
    ("trabalhando", "trabalh", "verb ando"),
    ("amigão", "amiga", "de-accented ao handling"),
    # not indexable: <3 or >=30 chars keep the original token
    ("ab", "ab", "too short -> filter keeps term"),
    ("x" * 31, "x" * 31, "too long -> filter keeps term"),
]


def test_galician_pairs():
    bad = [(w, e, galician_stem(w)) for w, e, _ in GL_PAIRS
           if galician_stem(w) != e]
    assert not bad, bad


def test_galician_minimal_pairs():
    bad = [(w, e, galician_minimal_stem(w)) for w, e in GL_MIN_PAIRS
           if galician_minimal_stem(w) != e]
    assert not bad, bad


def test_portuguese_rslp_pairs():
    bad = [(w, e, portuguese_rslp_stem(w)) for w, e, _ in PT_PAIRS
           if portuguese_rslp_stem(w) != e]
    assert not bad, bad


def test_brazilian_pairs():
    bad = [(w, e, _brazilian_token_stem(w)) for w, e, _ in BR_PAIRS
           if _brazilian_token_stem(w) != e]
    assert not bad, bad


def test_brazilian_not_indexable_returns_none():
    assert brazilian_stem("ab") is None
    assert brazilian_stem("x" * 31) is None


def test_brazilian_rule_data_complete():
    # the reference's Step1+Step2 contain exactly 156 suffix rules
    assert len(BR_STEP1) + len(BR_STEP2) == 156
    # the 'logias' quirk: ReplaceSuffix result discarded but Step1 ends
    quirks = [r for r in BR_STEP1 if r[9] and r[9][0][0] == "replace_noop"]
    assert len(quirks) == 1 and quirks[0][3] == "logias"


def test_rslp_exception_rules():
    # 'mais' is a whole-word exception of the galician plural 'ais' rule
    assert galician_stem("mais") != "mal"
    # 'barbadés' is an exception of the bare plural-s rule
    assert galician_minimal_stem("barbadés") == "barbadés"


def test_analyzers_stop_and_stem():
    gl = GalicianAnalyzer()
    toks = gl.terms("luces tamén mellores")
    assert "tamén" not in toks
    assert "luz" in toks and "mellor" in toks

    br = BrazilianAnalyzer()
    toks = br.terms("as meninas trabalhando")
    assert "as" not in toks
    assert "menin" in toks and "trabalh" in toks
