"""Snowball German/French stemmer fixtures + language-routed indexing.

Fixture pairs are rule-traced from the published Snowball algorithm
descriptions (classic editions) — each pair exercises a specific rule:
region computation, longest-match, the conditional replacements, and the
final unmark/unaccent steps."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucenenet_spark.analysis.snowball import (
    FrenchAnalyzer,
    GermanAnalyzer,
    LanguageRoutedAnalyzer,
    french_stem,
    german_stem,
)

GERMAN_PAIRS = [
    # step 1 (a) er/em/ern + unumlaut
    ("häuser", "haus"),
    ("bücher", "buch"),
    ("wandern", "wand"),
    ("aufeinander", "aufeinand"),
    # step 1 (b) e/en/es
    ("laufen", "lauf"),
    ("singen", "sing"),
    ("arbeiten", "arbeit"),
    ("kategorie", "kategori"),
    ("mädchen", "madch"),
    # step 1 (b) niss special case: trailing s of niss dropped
    ("kenntnisse", "kenntnis"),
    # step 1 (c) s after valid s-ending
    ("flugs", "flug"),
    # R1-start adjustment to >= 3: 'bis' keeps its s (p=2 < 3)
    ("bis", "bis"),
    # step 2 st after valid st-ending needs >= 6 letters
    ("kleinst", "klein"),
    ("erst", "erst"),
    # step 3 d-suffixes in R2
    ("bedeutung", "bedeut"),
    ("verwandlung", "verwandl"),
    # heit outside R2 survives
    ("schönheit", "schonheit"),
    # keit in R2, preceding lich/ig dropped only if in R2
    ("möglichkeiten", "moglich"),
    # ig not preceded by e, in R2
    ("auswendig", "auswend"),
    # ig preceded by e is kept
    ("steig", "steig"),
    # ß -> ss
    ("großen", "gross"),
    # intervocalic u stays consonant-marked (no vowel for R1 purposes)
    ("bauern", "bau"),
]

FRENCH_PAIRS = [
    # verb endings via 2a/2b
    ("chanter", "chant"),
    ("chanté", "chant"),
    ("chantant", "chant"),
    ("chantaient", "chant"),
    ("mangeaient", "mang"),
    ("voudriez", "voudr"),
    # step 1 standard suffixes
    ("continuité", "continu"),
    ("majestueux", "majestu"),
    ("nationaux", "national"),
    ("animaux", "animal"),
    ("châteaux", "château"),
    # logie -> log (R2)
    ("technologie", "technolog"),
    # usion outside R2 survives step 1; step 4 then strips ion after s
    ("conclusion", "conclus"),
    # -ent (3rd plural) is deliberately not a verb suffix in Snowball
    ("chantent", "chantent"),
    # issement after non-vowel in R1
    ("établissement", "établ"),
    # amment/emment -> ant/ent
    ("évidemment", "évident"),
    ("abondamment", "abond"),
    # step 4 residual: final s then e, ion after s/t
    ("permission", "permiss"),
    # step 5 undouble
    ("bonnette", "bonnet"),
    # step 6 un-accent
    ("complet", "complet"),
    ("complètement", "complet"),
    # marking: y -> Y then back; qu -> qU
    ("essayer", "essai"),
    ("quand", "quand"),
]


@pytest.mark.parametrize("word,stem", GERMAN_PAIRS)
def test_german_stem(word, stem):
    assert german_stem(word) == stem


@pytest.mark.parametrize("word,stem", FRENCH_PAIRS)
def test_french_stem(word, stem):
    assert french_stem(word) == stem


def test_german_stop_and_stem_chain():
    az = GermanAnalyzer()
    # stopwords removed, survivors stemmed, positions keep holes
    toks = az.tokenize_text("die häuser und bücher")
    assert [t for t, _ in toks] == ["haus", "buch"]
    assert [p for _, p in toks] == [1, 3]


def test_french_stop_and_stem_chain():
    az = FrenchAnalyzer()
    toks = az.tokenize_text("les animaux et la continuité")
    assert [t for t, _ in toks] == ["animal", "continu"]
    assert [p for _, p in toks] == [1, 4]


def test_language_routed_index(spark):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        (0, "de", "die häuser stehen"),
        (1, "de", "ein haus steht"),
        (2, "fr", "les animaux ont chanté"),
        (3, "fr", "un animal chante"),
        (4, "en", "the houses are standing"),
        (5, "zh", "unrouted language text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    router = LanguageRoutedAnalyzer(
        {"de": GermanAnalyzer(), "fr": FrenchAnalyzer()}
    )
    idx = build_index(docs, text_col="text", id_col="doc_id", analyzer=router)
    s = IndexSearcher(idx, mode="double")

    # German docs agree on the stem 'haus' (häuser and haus unify)
    de_hits = {r.doc_id for r in s.docset(TermQuery("haus")).collect()}
    assert de_hits == {0, 1}
    # French docs unify on 'animal' (animaux + animal)
    fr_hits = {r.doc_id for r in s.docset(TermQuery("animal")).collect()}
    assert fr_hits == {2, 3}
    # chanter verb forms unify on 'chant'
    ch = {r.doc_id for r in s.docset(TermQuery("chant")).collect()}
    assert ch == {2, 3}
    # default (unrouted) language passes through the StandardAnalyzer
    en = {r.doc_id for r in s.docset(TermQuery("houses")).collect()}
    assert en == {4}
    zh = {r.doc_id for r in s.docset(TermQuery("unrouted")).collect()}
    assert zh == {5}
    # German stopword 'die' indexed nowhere; English stop 'the' also absent
    assert s.docset(TermQuery("die")).count() == 0
    # query-side routing mirrors index-side analysis
    assert router.terms("les animaux", lang="fr") == ["animal"]
    assert router.terms("die häuser", lang="de") == ["haus"]


SPANISH_PAIRS = [
    # step 2b verb suffixes in RV
    ("canciones", "cancion"),
    ("corriendo", "corr"),
    ("gafas", "gaf"),
    ("comieron", "com"),
    # step 0 attached pronoun after gerund (accent removed from ándo)
    ("levantándose", "levant"),
    # step 1 standard suffixes
    ("nacionalidad", "nacional"),
    ("importantes", "import"),
    ("rápidamente", "rapid"),
    ("grabaciones", "grabacion"),
    # -ción only strips via ación/ución forms; accent still removed
    ("atención", "atencion"),
    # step 3 residual vowel
    ("libro", "libr"),
    ("data", "dat"),
    # logía -> log requires R2
    ("tecnología", "tecnolog"),
]


@pytest.mark.parametrize("word,stem", SPANISH_PAIRS)
def test_spanish_stem(word, stem):
    from lucenenet_spark.analysis.snowball import spanish_stem

    assert spanish_stem(word) == stem


def test_spanish_routed(spark):
    from lucenenet_spark.analysis.snowball import SpanishAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        (0, "es", "las canciones importantes"),
        (1, "es", "una canción corta"),
        (2, "en", "the songs are long"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    router = LanguageRoutedAnalyzer({"es": SpanishAnalyzer()})
    idx = build_index(docs, analyzer=router)
    s = IndexSearcher(idx, mode="double")
    # canciones and canción unify on 'cancion'; 'las'/'una' are es stops
    assert {r.doc_id for r in s.docset(TermQuery("cancion")).collect()} == {0, 1}
    assert s.docset(TermQuery("las")).count() == 0
