"""Analyzer parity tests — fixtures per FIXTURES.md §2 (mirroring the
reference's TestStandardAnalyzer / StopFilter position-increment tests)."""

import pandas as pd

from lucenenet_spark.analysis import StandardAnalyzer, WhitespaceAnalyzer, tokenize_batch


def test_stopword_holes():
    a = StandardAnalyzer()
    toks = a.tokenize_text("The quick brown fox jumps over the lazy dog")
    assert toks == [
        ("quick", 1),
        ("brown", 2),
        ("fox", 3),
        ("jumps", 4),
        ("over", 5),
        ("lazy", 7),
        ("dog", 8),
    ]


def test_punctuation_and_case():
    a = StandardAnalyzer()
    toks = a.tokenize_text("A fox!  a FOX, and another fox...")
    assert [t for t, _ in toks] == ["fox", "fox", "another", "fox"]
    # raw token indices: a=0 fox=1 a=2 fox=3 and=4 another=5 fox=6
    assert [p for _, p in toks] == [1, 3, 5, 6]


def test_all_stopwords():
    a = StandardAnalyzer()
    assert a.tokenize_text("to be or not to be") == []


def test_field_lengths_exclude_stopwords():
    a = StandardAnalyzer()
    rows, terms, pos, lens = a.tokenize_batch(
        pd.Series(["The quick brown fox", "to be or not to be", "", None])
    )
    assert lens.tolist() == [3, 0, 0, 0]
    assert terms.tolist() == ["quick", "brown", "fox"]


def test_midword_punctuation():
    a = StandardAnalyzer()
    # UAX#29 MidNumLet: can't / u.s.a stay single tokens; trailing dot drops
    assert a.terms("can't stop u.s.a.") == ["can't", "stop", "u.s.a"]
    assert a.terms("3.14 versions_2") == ["3.14", "versions_2"]


def test_max_token_length_drop():
    a = StandardAnalyzer()
    long_tok = "x" * 256
    ok_tok = "y" * 255
    assert a.terms(f"{long_tok} {ok_tok}") == [ok_tok]


def test_whitespace_analyzer():
    a = WhitespaceAnalyzer()
    assert a.terms("The quick FOX,") == ["The", "quick", "FOX,"]


def test_batch_flat_arrays_roundtrip():
    rows, terms, pos, lens = tokenize_batch(pd.Series(["w1 the w2", "w3"]))
    assert rows.tolist() == [0, 0, 1]
    assert terms.tolist() == ["w1", "w2", "w3"]
    assert pos.tolist() == [0, 2, 0]
    assert lens.tolist() == [2, 1]
