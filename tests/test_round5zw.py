"""Round-5 part-zw twins: Heaps'-law fit and Good-Turing smoothing."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.functions.textstats import good_turing_counts, heaps_law_fit


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


# -------------------------------------------------------------------- heaps
def test_heaps_pure_power_law_recovers_beta(spark):
    # craft V(T) = T^(1/2) exactly at the checkpoints: doc i adds
    # tokens so T_i = (i+1)^2 and exactly (i+1) - i distinct new terms
    texts = []
    vocab = 0
    tokens_so_far = 0
    for i in range(1, 11):
        t_target = i * i
        new_terms = i - vocab  # want v_cum = i at rank i
        words = ["w%d" % (vocab + j) for j in range(new_terms)]
        fill = t_target - tokens_so_far - len(words)
        words += ["w0"] * fill
        vocab += new_terms
        tokens_so_far = t_target
        texts.append(" ".join(words))
    row = heaps_law_fit(_docs(spark, texts), checkpoints=10).collect()[0]
    assert row["total_tokens"] == 100 and row["vocab"] == 10
    # ln V = 0.5 * ln T exactly -> slope 0.5 (quantization-level close)
    assert abs(row["slope_q"] - 500000) < 5
    assert abs(row["intercept_q"]) < 5


def test_heaps_python_replica(spark):
    texts = ["the cat sat", "a cat ran fast", "dogs ran", "the end of all things"]
    row = heaps_law_fit(_docs(spark, texts), checkpoints=4).collect()[0]
    seen, pts, t = set(), [], 0
    for txt in texts:
        ws = txt.split()
        t += len(ws)
        seen.update(ws)
        pts.append((t, len(seen)))
    # checkpoints at ranks 1..4 = every doc
    q = lambda v: math.floor(math.log(v) * 1e6 + 0.5)
    xs = [q(a) for a, _ in pts]
    ys = [q(b) for _, b in pts]
    n = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["slope_q"] == math.floor(slope * 1e6 + 0.5)
    assert row["total_tokens"] == t and row["vocab"] == len(seen)


def test_heaps_validates_checkpoints(spark):
    with pytest.raises(ValueError):
        heaps_law_fit(_docs(spark, ["x"]), checkpoints=1)


# -------------------------------------------------------------- good-turing
def test_gt_hand_computed_bigram_table(spark):
    # bigram events: 'a b' x3, 'b a' x2, 'b c' x1, 'c d' x1 (7 total)
    texts = ["a b", "a b a", "a b a", "b c d"]
    rows = {r["r"]: r for r in good_turing_counts(_docs(spark, texts), max_r=5).collect()}
    assert rows[1]["n_r"] == 2          # 'b c', 'c d'
    assert rows[2]["n_r"] == 1          # 'b a'
    assert rows[3]["n_r"] == 1          # 'a b'
    # r* for r=1: 2 * N_2 / N_1 = 2 * 1 / 2 = 1.0
    assert rows[1]["r_star_q6"] == 1000000
    # r* for r=2: 3 * N_3 / N_2 = 3
    assert rows[2]["r_star_q6"] == 3000000
    # r=3 has no N_4 -> r* = 0
    assert rows[3]["r_star_q6"] == 0
    assert rows[1]["total_tokens"] == 7  # total bigram events
    assert rows[1]["p0_q9"] == math.floor(2 / 7 * 1e9 + 0.5)


def test_gt_singleton_only_corpus(spark):
    texts = ["a b c d e"]  # every bigram unique
    rows = good_turing_counts(_docs(spark, texts), max_r=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["r"], r["n_r"], r["n_r1"], r["r_star_q6"]) == (1, 4, 0, 0)
    assert r["p0_q9"] == 1000000000  # all mass is singleton mass


def test_gt_validates_max_r(spark):
    with pytest.raises(ValueError):
        good_turing_counts(_docs(spark, ["x y"]), max_r=0)
