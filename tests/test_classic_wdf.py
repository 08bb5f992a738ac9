"""ClassicAnalyzer + WordDelimiterFilter fixtures (no Spark needed).

Expected streams follow the reference grammar/filter semantics:
ClassicTokenizerImpl.cs JFlex productions + ClassicFilter.cs:62-101, and
WordDelimiterFilter.cs / WordDelimiterIterator.cs boundary rules.
"""

from __future__ import annotations

import pandas as pd
import pytest

from lucenenet_spark.analysis.classic import ClassicAnalyzer, classic_filter_series
from lucenenet_spark.analysis.worddelim import WordDelimiterAnalyzer, split_subwords


# ---------------------------------------------------------------- classic
@pytest.mark.parametrize(
    "text,expected",
    [
        # ACRONYM: trailing-dot form strips dots; dotless form is HOST
        ("U.S.A. report", [("usa", 0), ("report", 1)]),
        ("U.S.A report", [("u.s.a", 0), ("report", 1)]),
        # HOST keeps dots; longest-match beats the ACRONYM prefix
        ("visit lucene.apache.org now", [("visit", 0), ("lucene.apache.org", 1), ("now", 2)]),
        ("x.y.a.b deep", [("x.y.a.b", 0), ("deep", 1)]),
        # COMPANY / EMAIL survive whole
        ("call AT&T first", [("call", 0), ("at&t", 1), ("first", 2)]),
        (
            "mail some.user@mail.example.com today",
            [("mail", 0), ("some.user@mail.example.com", 1), ("today", 2)],
        ),
        # NUM needs a digit; plain hyphenation splits
        ("pay 1,000 for wi-fi5 not foo-bar", [
            ("pay", 0), ("1,000", 1), ("wi-fi5", 3), ("foo", 5), ("bar", 6),
        ]),
        ("pi is 3.14 here", [("pi", 0), ("3.14", 2), ("here", 3)]),
        # APOSTROPHE kept whole; ClassicFilter strips only trailing 's
        ("O'Reilly's book don't", [("o'reilly", 0), ("book", 1), ("don't", 2)]),
        # possessive strip happens BEFORE the stop filter: it's -> it -> hole
        ("it's a trap", [("trap", 2)]),
        # digit-bearing possessive is NOT an APOSTROPHE token (grammar: ALPHA only)
        ("dept3's files", [("dept3", 0), ("s", 1), ("files", 2)]),
    ],
)
def test_classic_tokenize(text, expected):
    assert ClassicAnalyzer().tokenize_text(text) == expected


def test_classic_filter_series_shapes():
    s = pd.Series(["U.S.A.", "O'Reilly's", "don't", "plain", "u.s.a"])
    out = classic_filter_series(s).tolist()
    # dotless u.s.a is HOST-shaped, not ACRONYM -> untouched
    assert out == ["USA", "O'Reilly", "don't", "plain", "u.s.a"]


def test_classic_field_lens_count_survivors():
    rows, terms, pos, lens = ClassicAnalyzer().tokenize_batch(
        pd.Series(["it's a trap", "U.S.A. dept corp's"])
    )
    assert lens.tolist() == [1, 3]
    assert terms.tolist() == ["trap", "usa", "dept", "corp"]


# ---------------------------------------------------------- word delimiter
@pytest.mark.parametrize(
    "token,parts",
    [
        ("PowerShot", ["Power", "Shot"]),
        ("USAToday", ["USA", "Today"]),
        ("WiFi5Pro", ["Wi", "Fi", "5", "Pro"]),
        ("wi-fi", ["wi", "fi"]),
        ("500-42", ["500", "42"]),
        ("j2se", ["j", "2", "se"]),
        ("----", []),
        ("ABC", ["ABC"]),
    ],
)
def test_split_subwords(token, parts):
    assert split_subwords(token) == parts


def test_split_flags_off():
    assert split_subwords("PowerShot", split_on_case_change=False) == ["PowerShot"]
    assert split_subwords("j2se", split_on_numerics=False) == ["j2se"]


def test_wdf_positions_consecutive_and_holes():
    a = WordDelimiterAnalyzer()
    # "the" stop-removed leaves the hole at 0; parts advance one position each
    assert a.tokenize_text("the PowerShot500's zoom") == [
        ("power", 1), ("shot", 2), ("500", 3), ("zoom", 4),
    ]
    # all-delimiter token vanishes but still consumes a position (gap accumulation)
    assert a.tokenize_text("-- plain words") == [("plain", 1), ("words", 2)]


def test_wdf_catenate_and_preserve_overlap():
    a = WordDelimiterAnalyzer(catenate_all=True, preserve_original=True, stopwords=None)
    toks = a.tokenize_text("Wi-Fi5")
    # original + catenation + first part all overlap at position 0
    assert ("wi-fi5", 0) in toks and ("wifi5", 0) in toks and ("wi", 0) in toks
    assert ("fi", 1) in toks and ("5", 2) in toks


def test_wdf_norm_counts_only_increments():
    a = WordDelimiterAnalyzer(catenate_all=True, preserve_original=True, stopwords=None)
    _, _, _, lens = a.tokenize_batch(pd.Series(["Wi-Fi5"]))
    # wi/fi/5 advance; original + catenation overlap (posIncr 0) and are
    # discounted from the norm length (discountOverlaps=true)
    assert lens.tolist() == [3]


# ----------------------------------------------- stem protection seams
def test_keyword_marker_and_override():
    from lucenenet_spark.analysis.analyzers import EnglishAnalyzer

    plain = EnglishAnalyzer()
    assert plain.terms("merging streams quickly") == ["merg", "stream", "quickli"]

    prot = EnglishAnalyzer(
        stem_exclusions=frozenset({"merging"}), stem_overrides={"streams": "flow"}
    )
    assert prot.terms("merging streams quickly") == ["merging", "flow", "quickli"]

    # override wins over exclusion when both match (keywordAtt semantics)
    both = EnglishAnalyzer(
        stem_exclusions=frozenset({"streams"}), stem_overrides={"streams": "flow"}
    )
    assert both.terms("streams") == ["flow"]


def test_wdf_catenate_runs():
    a = WordDelimiterAnalyzer(
        generate_word_parts=False, generate_number_parts=False,
        catenate_words=True, catenate_numbers=True, stopwords=None,
    )
    # catenations stand alone per same-type run; boundary-free tokens pass
    assert a.tokenize_text("wi-fi 500-42 plain") == [
        ("wifi", 0), ("50042", 1), ("plain", 2),
    ]
    b = WordDelimiterAnalyzer(catenate_words=True, catenate_numbers=True, stopwords=None)
    # with generation on, run joins overlap their run's FIRST subword
    assert b.tokenize_text("wi-fi-500-42") == [
        ("wi", 0), ("wifi", 0), ("fi", 1), ("500", 2), ("50042", 2), ("42", 3),
    ]


def test_wdf_single_subword_fast_path():
    # generation off must NOT drop boundary-free tokens
    a = WordDelimiterAnalyzer(
        generate_word_parts=False, generate_number_parts=False, stopwords=None
    )
    assert a.tokenize_text("wi-fi plain") == [("plain", 1)]
    b = WordDelimiterAnalyzer(catenate_all=True, preserve_original=True, stopwords=None)
    assert b.tokenize_text("plain") == [("plain", 0)]


def test_jaro_winkler_reference_values():
    from lucenenet_spark.search.distances import jaro_winkler

    assert jaro_winkler("x", "x") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    # classic published examples of the metric
    assert abs(jaro_winkler("martha", "marhta") - 0.9611) < 1e-3
    assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133) < 1e-3
    # below the 0.7 threshold no Winkler boost applies (pure Jaro)
    v = jaro_winkler("table", "bolt")
    assert v < 0.7


# ----------------------------------------------- misc token filters
def test_filtered_analyzer_stages():
    import pandas as pd

    from lucenenet_spark.analysis.miscfilters import FilteredAnalyzer

    a = FilteredAnalyzer(min_length=4, max_length=6)
    assert a.tokenize_text("key merge windowing the batch row") == [
        ("merge", 1), ("batch", 4),
    ]
    k = FilteredAnalyzer(keep_words=frozenset({"merge"}))
    assert k.tokenize_text("key merge batch") == [("merge", 1)]
    c = FilteredAnalyzer(limit_tokens=3)
    rows, terms, pos, lens = c.tokenize_batch(
        pd.Series(["one two three four five", "a b"])
    )
    assert terms.tolist() == ["one", "two", "three", "b"]
    assert lens.tolist() == [3, 1]
    # stopword hole upstream preserved: 'b' sits at pre-filter position 1
    assert pos.tolist() == [0, 1, 2, 1]


def test_ngram_distance_reference_goldens():
    """Reference TestNGramDistance.cs golden vectors, all three n sizes."""
    from lucenenet_spark.search.distances import ngram_distance as d

    for n, cases in (
        (1, [("abcvwxyz", "cabvwxyz", 0.75), ("dwayne", "duane", 0.666),
             ("dixon", "dicksonx", 0.5), ("natural", "contrary", 0.25)]),
        (2, [("a", "aa", 0.5), ("abcvwxyz", "cabvwxyz", 0.625),
             ("dwayne", "duane", 0.5833), ("martha", "marhta", 0.6666),
             ("jones", "johnson", 0.4285), ("six", "ten", 0.0)]),
        (3, [("martha", "marhta", 0.7222), ("dixon", "dicksonx", 0.4583),
             ("natural", "contrary", 0.2083), ("dwayne", "duane", 0.5277)]),
    ):
        for a, b, e in cases:
            assert abs(d(a, b, n=n) - e) < 0.001, (n, a, b)
    assert d("", "al", n=1) == 0.0 and d("", "", n=2) == 1.0
    assert d("zac ephron", "zac efron") > d("zac ephron", "kai ephron")
