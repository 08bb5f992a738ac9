"""Round-5 part-zzza twins: prefix-filter exact similarity join and
unigram-LM Viterbi tokenization."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.dedup import prefix_filter_pairs, shingles
from lucenenet_spark.functions.unigram_lm import unigram_lm_segment, unigram_lm_vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


_TEXTS = [
    "the quick brown fox jumps over the lazy dog",          # 0
    "the quick brown fox jumps over the lazy cat",          # 1: near-dup of 0
    "the quick brown fox jumps over the lazy dog",          # 2: exact dup of 0
    "a completely different sentence about spark engines",  # 3
    "spark engines completely differ about a sentence",     # 4: same words, reshuffled
    "the quick brown fox leaps over the lazy dog today",    # 5: near of 0
]


def _shingle_sets(texts, n=3):
    out = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        out[i] = {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }
    return out


def _brute_pairs(sets, t_num=1, t_den=2):
    pairs = []
    ids = sorted(sets)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            i = len(sets[x] & sets[y])
            u = len(sets[x] | sets[y])
            if u and i * (t_den + t_num) >= t_num * (len(sets[x]) + len(sets[y])):
                pairs.append((x, y, i, u, (20000 * i + u) // (2 * u)))
    return sorted(pairs)


def test_prefix_filter_matches_bruteforce(spark):
    got = sorted(
        (r["doc_a"], r["doc_b"], r["inter"], r["uni"], r["jacc_q4"])
        for r in prefix_filter_pairs(_docs(spark, _TEXTS)).collect()
    )
    want = _brute_pairs(_shingle_sets(_TEXTS))
    assert got == want
    assert (0, 2, 7, 7, 10000) in got  # the exact dup at J=1


def test_prefix_filter_completeness_property(spark):
    """The WWW'07 guarantee: joining only the prefixes loses no true
    pair — verified against brute force on a corpus engineered so most
    shingles are SHARED (the hostile case for a lossy filter)."""
    texts = [
        "x y z w v u t s",
        "x y z w v u t q",    # 7/9 overlap
        "x y z w v u q t",    # reshuffled tail
        "p p2 p3 p4 p5 p6 p7 p8",
    ]
    got = sorted(
        (r["doc_a"], r["doc_b"]) for r in prefix_filter_pairs(_docs(spark, texts)).collect()
    )
    want = [(a, b) for a, b, *_ in _brute_pairs(_shingle_sets(texts))]
    assert got == want


def test_prefix_filter_threshold_integer_exact(spark):
    # J exactly AT the 1/2 threshold must be INCLUDED (>=, not >):
    # sets sized 3 and 3 with intersection 2 -> J = 2/4 = 1/2 exactly.
    texts = [
        "a b c d e",  # shingles: abc bcd cde (3)
        "a b c d f",  # shingles: abc bcd cdf (3), inter=2, union=4
    ]
    rows = prefix_filter_pairs(_docs(spark, texts)).collect()
    assert [(r["doc_a"], r["doc_b"], r["jacc_q4"]) for r in rows] == [(0, 1, 5000)]
    assert rows[0]["inter"] == 2


# ----------------------------------------------------------------------
# unigram-LM tokenizer
# ----------------------------------------------------------------------


def _py_vocab(texts, top_k=12, max_piece_len=4):
    """Independent Python replica of the vocab derivation."""
    from collections import Counter

    freq = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] += 1
    chars = Counter()
    grams = Counter()
    for w, f in freq.items():
        for ch in w:
            chars[ch] += f
        for n in range(2, max_piece_len + 1):
            for i in range(len(w) - n + 1):
                grams[w[i : i + n]] += f
    top = sorted(grams.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    vocab = dict(chars)
    vocab.update(dict(top))
    tot = float(sum(vocab.values()))
    return freq, {p: int(math.floor(-math.log(c / tot) * 1e6 + 0.5)) for p, c in vocab.items()}


def _py_segment(word, cost, max_piece_len=4):
    """Viterbi replica: min cost, ties prefer the LONGER final piece."""
    L = len(word)
    best = [0] + [None] * L
    back = [0] * (L + 1)
    for i in range(1, L + 1):
        cands = []
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l : i]
            if piece in cost and best[i - l] is not None:
                cands.append((best[i - l] + cost[piece], -l))
        c, negl = min(cands)
        best[i], back[i] = c, -negl
    pieces = []
    i = L
    while i > 0:
        pieces.append(word[i - back[i] : i])
        i -= back[i]
    pieces.reverse()
    return best[L], pieces


def test_unigram_vocab_replica(spark):
    texts = ["hello world hello", "worldly words wordless", "low low lower"]
    freq, want = _py_vocab(texts)
    got = dict(unigram_lm_vocab(_docs(spark, texts)))
    assert got == want


def test_unigram_segment_replica(spark):
    texts = ["hello world hello", "worldly words wordless", "low low lower"]
    freq, cost = _py_vocab(texts)
    rows = {r["word"]: r for r in unigram_lm_segment(_docs(spark, texts)).collect()}
    assert set(rows) == set(freq)
    for w in freq:
        c, pieces = _py_segment(w, cost)
        r = rows[w]
        assert (r["cost_q6"], r["n_pieces"], r["seg"]) == (c, len(pieces), "|".join(pieces)), w
        # segmentation is a true cover of the word
        assert r["seg"].replace("|", "") == w
        assert r["freq"] == freq[w]


def test_unigram_longer_piece_wins_tie(spark):
    # 'abab': with 'ab' in vocab (freq-dominant), segmentation must use
    # the multi-char pieces, and the seg covers the word exactly.
    texts = ["abab abab ab ab ab a b"]
    freq, cost = _py_vocab(texts, top_k=2)
    rows = {
        r["word"]: r
        for r in unigram_lm_segment(_docs(spark, texts), top_k=2).collect()
    }
    c, pieces = _py_segment("abab", cost)
    assert rows["abab"]["seg"] == "|".join(pieces)
    assert rows["abab"]["cost_q6"] == c


def test_unigram_word_too_long_raises(spark):
    texts = ["abcdefghijklmnopqrstuvwxyz short words"]
    with pytest.raises(Exception, match="max_word_len"):
        unigram_lm_segment(_docs(spark, texts), max_word_len=10).collect()
