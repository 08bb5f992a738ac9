"""Round-5 part-zzze twins: readability scores and LZ-window coverage."""

from __future__ import annotations

import math
import re

from lucenenet_spark.functions.repetition import lz_window_coverage
from lucenenet_spark.functions.textstats import readability_scores


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_readability(text):
    words = [w for w in text.split(" ") if w]
    n_w = len(words)
    n_s = max(1, len(re.findall(r"[.!?]+", text)))
    syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
    wps, spw = n_w / n_s, syl / n_w
    fre = math.floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e4 + 0.5)
    fkgl = math.floor((0.39 * wps + 11.8 * spw - 15.59) * 1e4 + 0.5)
    return n_w, n_s, syl, fre, fkgl


def test_readability_replica(spark):
    texts = [
        "The cat sat on the mat. It was warm! Was it?",
        "Incomprehensibility characterizes multisyllabic terminological obfuscation",
        "a b c",  # consonant-only words still count one syllable each
    ]
    rows = {r["doc_id"]: r for r in readability_scores(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        w, s, syl, fre, fkgl = _py_readability(t)
        r = rows[i]
        got = (r["n_words"], r["n_sentences"], r["n_syllables"], r["fre_q4"], r["fkgl_q4"])
        assert got == (w, s, syl, fre, fkgl), i


def test_readability_simple_beats_jargon(spark):
    texts = [
        "The cat sat on the mat. The dog ran to the tree.",
        "Incomprehensibility characterizes multisyllabic terminological obfuscation entirely.",
    ]
    rows = {r["doc_id"]: r for r in readability_scores(_docs(spark, texts)).collect()}
    assert rows[0]["fre_q4"] > rows[1]["fre_q4"]
    assert rows[0]["fkgl_q4"] < rows[1]["fkgl_q4"]


def _py_lz(text, gram=8, window=256):
    n = max(len(text) - gram + 1, 0)
    grams = [text[i : i + gram] for i in range(n)]
    rep = 0
    for i in range(n):
        lo = max(0, i - window)
        if grams[i] in grams[lo:i]:
            rep += 1
    return n, rep


def test_lz_replica(spark):
    texts = [
        "abcdefgh" * 6,                      # pure loop: heavy repetition
        "the quick brown fox jumps over the lazy dog today",
        "x" * 30,                            # single-char run
        "short",                             # below gram size: no row emitted
    ]
    rows = {r["doc_id"]: r for r in lz_window_coverage(_docs(spark, texts)).collect()}
    assert 3 not in rows  # sub-gram docs have zero positions, hence no row
    for i, t in enumerate(texts[:3]):
        n, rep = _py_lz(t)
        r = rows[i]
        assert (r["n_grams"], r["n_repeated"]) == (n, rep), i
        assert r["rep_ppm"] == rep * 10**6 // n


def test_lz_window_limits_matches(spark):
    # the repeat sits FARTHER than the window: no coverage
    filler = "".join(chr(97 + (i * 7) % 26) + chr(97 + (i * 11) % 26) for i in range(200))
    text = "UNIQUEBLOCK" + filler + "UNIQUEBLOCK"
    rows = lz_window_coverage(_docs(spark, [text]), window=64).collect()
    n, rep = _py_lz(text, window=64)
    assert (rows[0]["n_grams"], rows[0]["n_repeated"]) == (n, rep)
    # and with a window big enough, the trailing block IS covered
    rows2 = lz_window_coverage(_docs(spark, [text]), window=1024).collect()
    n2, rep2 = _py_lz(text, window=1024)
    assert rows2[0]["n_repeated"] == rep2 > rep


def test_lz_loop_scores_higher_than_prose(spark):
    texts = ["abcdefgh" * 6, "the quick brown fox jumps over the lazy dog today"]
    rows = {r["doc_id"]: r for r in lz_window_coverage(_docs(spark, texts)).collect()}
    assert rows[0]["rep_ppm"] > rows[1]["rep_ppm"]
