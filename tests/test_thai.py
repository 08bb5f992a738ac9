"""ThaiAnalyzer tests: dictionary segmentation, stop holes, norms."""

from lucenenet_spark.analysis.thai import THAI_STOP_WORDS, ThaiAnalyzer


def test_segments_runs_by_dictionary():
    az = ThaiAnalyzer(user_dict={"สวัสดี", "ครับ", "ไทย", "แลนด์"})
    assert az.terms("สวัสดีครับ ไทยแลนด์") == [
        "สวัสดี", "ครับ", "ไทย", "แลนด์"
    ]


def test_unmatched_span_stays_whole():
    az = ThaiAnalyzer(user_dict={"ไทย"})
    # ไทย matches, the rest of the run is one unknown fragment
    assert az.terms("ไทยแลนด์") == ["ไทย", "แลนด์"]
    # fully unknown run survives as itself
    assert az.terms("สวัสดี") == ["สวัสดี"]


def test_stop_words_leave_position_holes():
    az = ThaiAnalyzer(user_dict={"ของ", "ไทย"})
    import pandas as pd

    r, t, p, fl = az.tokenize_batch(pd.Series(["ของไทย"]))
    # ของ is a stop word: dropped, position 0 is a hole, ไทย at pos 1
    assert list(t) == ["ไทย"]
    assert list(p) == [1]
    assert list(fl) == [1]


def test_latin_passthrough_lowercased():
    az = ThaiAnalyzer(user_dict=set())
    assert az.terms("Hello ไทย") == ["hello", "ไทย"]


def test_default_stop_set_applies():
    az = ThaiAnalyzer(user_dict=set())
    assert "ของ" in THAI_STOP_WORDS
    assert az.terms("ของ") == []
