"""Round-5 part-zzd twins: Katz back-off and back-off rate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from lucenenet_spark.functions.lm_quality import (
    katz_backoff_bigram_logprob,
    oov_rate,
)


def _docs(spark, texts, base=0):
    return spark.createDataFrame(
        [(base + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _katz_replica(train_texts, test_texts, k_cut=5):
    q12 = 1e12
    pairs = []
    for t in train_texts:
        w = t.split()
        pairs += list(zip(w, w[1:]))
    cb = Counter(pairs)
    c1 = defaultdict(int)
    for (w1, _), c in cb.items():
        c1[w1] += c
    uni = Counter(w for t in train_texts for w in t.split())
    t_tok = sum(uni.values())
    nr = Counter(cb.values())

    def d(r):
        if r < k_cut and nr.get(r + 1):
            return (r + 1) * nr[r + 1] / (nr[r] * r)
        return 1.0

    pseen = {
        (w1, w2): math.floor(d(c) * c / c1[w1] * q12 + 0.5) for (w1, w2), c in cb.items()
    }
    pml = {
        (w1, w2): math.floor(uni[w2] / t_tok * q12 + 0.5) for (w1, w2) in cb
    }
    left = defaultdict(lambda: int(q12))
    den = defaultdict(lambda: int(q12))
    for (w1, w2), v in pseen.items():
        left[w1] -= v
        den[w1] -= pml[(w1, w2)]
    out = {}
    for did, t in enumerate(test_texts):
        w = t.split()
        lps = []
        for pair in zip(w, w[1:]):
            w1, w2 = pair
            if pair in pseen:
                p = pseen[pair] / q12
            elif w1 in c1 and w2 in uni and left[w1] > 0 and den[w1] > 0:
                p = (left[w1] / den[w1]) * (uni[w2] / t_tok)
            else:
                continue
            lps.append(math.floor(math.log(p) * 1e6 + 0.5))
        if lps:
            out[did] = (len(lps), sum(lps))
    return out


def test_katz_python_replica_with_backoff(spark):
    train_texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog ran",
        "the cat ran home",
    ]
    test_texts = ["the dog ran home", "a cat sat on the log", "the mat ran"]
    train = _docs(spark, train_texts)
    test = _docs(spark, test_texts, base=100)
    got = {
        r["doc_id"] - 100: (r["n_bigrams"], r["sum_lp_q6"])
        for r in katz_backoff_bigram_logprob(test, train=train).collect()
    }
    want = _katz_replica(train_texts, test_texts)
    assert got == want
    # the test split contains a pair absent from training ('mat ran')
    # -> the back-off path was exercised
    all_train_pairs = {
        p for t in train_texts for p in zip(t.split(), t.split()[1:])
    }
    assert ("mat", "ran") not in all_train_pairs


def test_katz_seen_probabilities_discounted_below_ml(spark):
    train_texts = ["a b a b a c a d a e", "b a b c b d"]
    train = _docs(spark, train_texts)
    got = katz_backoff_bigram_logprob(
        _docs(spark, ["a b"], base=50), train=train
    ).collect()[0]
    # replica agreement is the strong check; also P('b'|'a') < ML since
    # N_2/N_1 discounting fires for small counts
    want = _katz_replica(train_texts, ["a b"])
    assert (got["n_bigrams"], got["sum_lp_q6"]) == want[0]


def test_katz_validates_k_cut(spark):
    d = _docs(spark, ["x y"])
    with pytest.raises(ValueError):
        katz_backoff_bigram_logprob(d, train=d, k_cut=1)


# ------------------------------------------------------------ backoff rate
def test_oov_token_unit(spark):
    train = _docs(spark, ["alpha beta gamma"])
    test = _docs(spark, ["alpha zeta beta", "omega psi"], base=10)
    rows = {r["doc_id"]: r for r in oov_rate(test, train=train).collect()}
    assert (rows[10]["n_tokens"], rows[10]["n_oov"]) == (3, 1)
    assert (rows[11]["n_tokens"], rows[11]["n_oov"]) == (2, 2)
    assert rows[11]["oov_q6"] == 1000000


def test_oov_bigram_unit(spark):
    train = _docs(spark, ["a b c"])
    test = _docs(spark, ["a b d", "c a"], base=10)
    rows = {r["doc_id"]: r for r in oov_rate(test, train=train, unit="bigram").collect()}
    # doc10 pairs: (a,b) seen, (b,d) unseen; doc11: (c,a) unseen
    assert (rows[10]["n_tokens"], rows[10]["n_oov"]) == (2, 1)
    assert (rows[11]["n_tokens"], rows[11]["n_oov"]) == (1, 1)


def test_oov_validates_unit(spark):
    d = _docs(spark, ["x y"])
    with pytest.raises(ValueError):
        oov_rate(d, train=d, unit="trigram")
