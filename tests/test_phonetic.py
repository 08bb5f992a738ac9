"""PhoneticAnalyzer (Analysis.Phonetic module analogue) — encoder
vectors + replace/inject analyzer semantics through build_index."""

from __future__ import annotations

import pandas as pd
import pytest

from lucenenet_spark.analysis.phonetic import (
    PhoneticAnalyzer,
    cologne_phonetic,
    refined_soundex,
    soundex,
)


@pytest.mark.parametrize(
    "word,key",
    [
        ("robert", "r163"),
        ("rupert", "r163"),
        ("ashcraft", "a261"),   # h-transparency: s..c collapse across h
        ("ashcroft", "a261"),
        ("tymczak", "t522"),    # z after c same class, vowel resets
        ("pfister", "p236"),    # pf collapses into the first letter
        ("honeyman", "h555"),
    ],
)
def test_soundex_vectors(word, key):
    assert soundex(word) == key


def test_refined_soundex_vectors():
    assert refined_soundex("testing") == "t6036084"
    assert refined_soundex("trouble") == "t690170"
    # d/t share class 6: identical digit streams, different first letter
    assert refined_soundex("dime")[1:] == refined_soundex("time")[1:]


def test_cologne_vectors():
    assert cologne_phonetic("müller") == "657"
    assert cologne_phonetic("breschnew") == "17863"
    assert cologne_phonetic("wikipedia") == "3412"
    # ph -> 3 (f-class), not 1+h
    assert cologne_phonetic("philip") == cologne_phonetic("filip")


def test_replace_mode_maps_terms():
    a = PhoneticAnalyzer("soundex")
    _, terms, _, lens = a.tokenize_batch(pd.Series(["robert calls rupert"]))
    assert list(terms) == [soundex("robert"), soundex("calls"), soundex("rupert")]
    assert terms[0] == terms[2] == "r163"
    assert lens[0] == 3


def test_inject_mode_keeps_originals_and_positions():
    a = PhoneticAnalyzer("soundex", inject=True)
    r, terms, pos, lens = a.tokenize_batch(pd.Series(["robert calls"]))
    got = sorted(zip(terms.tolist(), pos.tolist()))
    # original + key at the SAME position, norms count originals only
    assert ("robert", 0) in got and ("r163", 0) in got
    assert ("calls", 1) in got and ("c420", 1) in got
    assert lens[0] == 2


def test_inject_mode_no_duplicate_when_key_equals_term():
    a = PhoneticAnalyzer("soundex", inject=True)
    # 'r163' encodes to itself? no — craft a term equal to its key is hard;
    # instead assert no term appears twice at one position
    _, terms, pos, _ = a.tokenize_batch(pd.Series(["robert robert"]))
    seen = list(zip(terms.tolist(), pos.tolist()))
    assert len(seen) == len(set(seen))


def test_unknown_encoder_rejected():
    with pytest.raises(ValueError):
        PhoneticAnalyzer("metaphone99")


def test_search_phonetic_match(spark):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    df = spark.createDataFrame(
        [(0, "rupert writes code"), (1, "robert reads code"), (2, "alice ships code")],
        "doc_id long, text string",
    )
    s = IndexSearcher(build_index(df, analyzer=PhoneticAnalyzer("soundex")))
    hits = {r["doc_id"] for r in s.search(TermQuery("r163"), 10).collect()}
    assert hits == {0, 1}
