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
