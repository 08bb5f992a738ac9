"""Differential test: Arrow-native tokenizer == pandas/regex tokenizer,
byte-for-byte, including the irregular-candidate fallback path."""

import numpy as np
import pandas as pd
import pytest

from lucenenet_spark.analysis.analyzers import (
    StandardAnalyzer,
    tokenize_batch,
    tokenize_batch_arrow,
)
from lucenenet_spark.testgen import generate_corpus


def _both(texts):
    r1, t1, p1, l1 = tokenize_batch(pd.Series(texts))
    r2, c2, d2, p2, l2 = tokenize_batch_arrow(pd.Series(texts))
    t2 = d2.take(__import__("pyarrow").array(c2)).to_pylist()
    return (r1.tolist(), t1.tolist(), p1.tolist(), l1.tolist()), (
        r2.tolist(),
        t2,
        p2.tolist(),
        l2.tolist(),
    )


def test_identical_on_fixtures():
    texts = [
        "The quick brown fox jumps over the lazy dog",
        "A fox!  a FOX, and another fox...",
        "to be or not to be that is the question",
        "",
        None,
        "can't stop u.s.a. 3.14 versions_2",
        "a..b c. .d '' 'quoted' trailing'",
        "x" * 256 + " ok",
        "Ünïcode Àccents résumé",
        "  leading and trailing  ",
    ]
    a, b = _both(texts)
    assert a == b


def test_identical_on_random_corpus():
    pdf = generate_corpus(300, seed=7)
    a, b = _both(pdf["text"].tolist())
    assert a == b


def test_analyzer_fast_path_flag():
    assert StandardAnalyzer().supports_arrow_fast_path
    import re

    custom = StandardAnalyzer(token_re=re.compile(r"\S+"))
    assert not custom.supports_arrow_fast_path


# ---------------------------------------------------------------------------
# UAX#29 BMP extension (round 4): CJK / Hangul / Thai / Cyrillic classes,
# fixtures following the reference StandardTokenizer's emitted types
# (one token per Han char and per Hiragana char; Katakana/Hangul/Thai runs)
# ---------------------------------------------------------------------------
import pandas as pd

UAX_CASES = [
    ("我是中国人", ["我", "是", "中", "国", "人"]),
    ("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"]),
    ("サッカー", ["サッカー"]),
    ("안녕하세요 세계", ["안녕하세요", "세계"]),
    ("ภาษาไทย", ["ภาษาไทย"]),
    ("Привет мир", ["привет", "мир"]),
    # U+02BF (modifier letter) is not word material -> breaks the run
    ("šarīʿah العربية", ["šarī", "ah", "العربية"]),
    ("mixed中文and latin", ["mixed", "中", "文", "and", "latin"]),
    ("3.14 O'Neil C++", ["3.14", "o'neil", "c"]),
    ("日本語123abc", ["日", "本", "語", "123abc"]),
]


def test_uax29_bmp_fixtures():
    from lucenenet_spark.analysis.analyzers import tokenize_batch

    for text, expected in UAX_CASES:
        _, terms, _, _ = tokenize_batch(
            pd.Series([text]), stopwords=None, lowercase=True
        )
        assert list(terms) == expected, text


def test_uax29_arrow_differential():
    """The Arrow fast path's surgery branch must emit the identical stream
    for mixed-script input."""
    from lucenenet_spark.analysis.analyzers import (
        tokenize_batch,
        tokenize_batch_arrow,
    )

    texts = pd.Series([t for t, _ in UAX_CASES] + ["pure ascii text stays fast"])
    r1, t1, p1, f1 = tokenize_batch(texts, stopwords=None)
    r2, c2, d2, p2, f2 = tokenize_batch_arrow(texts, stopwords=None)
    t2 = [d2[int(c)].as_py() for c in c2]
    assert list(t1) == t2
    assert list(r1) == list(r2)
    assert list(p1) == list(p2)
    assert list(f1) == list(f2)
