"""Round-5 part-zm twins: BPE merge learning and LexRank centrality."""

from __future__ import annotations

import pytest

from lucenenet_spark.functions.bpe import bpe_learn_merges
from lucenenet_spark.functions.summarize import lexrank_top_sentences


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


# ---------------------------------------------------------------------- bpe
def test_bpe_classic_low_lower(spark):
    rows = {r["round"]: r for r in bpe_learn_merges(_docs(spark, ["low low lower"]), 3).collect()}
    # r1: (l,o) and (o,w) both 3 -> w1 tie-break; r2: lo+w=3; r3: (e,r)=1 wins on w1
    assert (rows[1]["w1"], rows[1]["w2"], rows[1]["pair_count"]) == ("l", "o", 3)
    assert (rows[2]["w1"], rows[2]["w2"], rows[2]["pair_count"]) == ("lo", "w", 3)
    assert (rows[3]["w1"], rows[3]["w2"], rows[3]["pair_count"]) == ("e", "r", 1)


def test_bpe_greedy_left_to_right_merge(spark):
    # "aaaa" -> merge (a,a) must yield [aa, aa], so round 2 sees (aa,aa)
    rows = {r["round"]: r for r in bpe_learn_merges(_docs(spark, ["aaaa"]), 2).collect()}
    assert (rows[1]["w1"], rows[1]["w2"], rows[1]["pair_count"]) == ("a", "a", 3)
    assert (rows[2]["w1"], rows[2]["w2"], rows[2]["pair_count"]) == ("aa", "aa", 1)


def test_bpe_counts_weighted_by_word_frequency(spark):
    # 'ab' appears 5 times across docs, 'cd' twice -> (a,b) wins round 1
    rows = bpe_learn_merges(_docs(spark, ["ab ab ab cd", "ab ab cd"]), 1).collect()
    assert len(rows) == 1
    assert (rows[0]["w1"], rows[0]["w2"], rows[0]["pair_count"]) == ("a", "b", 5)


def test_bpe_rejects_bad_rounds(spark):
    with pytest.raises(ValueError):
        bpe_learn_merges(_docs(spark, ["x"]), 0)


# ------------------------------------------------------------------ lexrank
def test_lexrank_connected_pair_beats_isolate(spark):
    rows = lexrank_top_sentences(
        _docs(spark, ["a b c a b d x y z"]), sent_len=3
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # s0~s1 share {a,b} (cos 2/3), s2 isolated; tie between s0/s1 -> s0
    assert (r["sent_id"], r["degree"], r["n_sents"]) == (0, 1, 3)


def test_lexrank_threshold_prunes_edges(spark):
    txt = "a b c a x y"  # cos(s0,s1) = 1/3
    lo = lexrank_top_sentences(_docs(spark, [txt]), sent_len=3, threshold_q6=100000).collect()[0]
    hi = lexrank_top_sentences(_docs(spark, [txt]), sent_len=3, threshold_q6=500000).collect()[0]
    assert lo["degree"] == 1 and hi["degree"] == 0


def test_lexrank_quantized_cosine_boundary(spark):
    # tf vectors: s0 = {a:2, b:1}, s1 = {a:1, c:2}; cos = 2/5 = 0.4 exactly
    txt = "a a b a c c"
    at = lexrank_top_sentences(_docs(spark, [txt]), sent_len=3, threshold_q6=400000).collect()[0]
    above = lexrank_top_sentences(_docs(spark, [txt]), sent_len=3, threshold_q6=400001).collect()[0]
    assert at["degree"] == 1 and above["degree"] == 0


def test_lexrank_single_sentence_doc(spark):
    r = lexrank_top_sentences(_docs(spark, ["hello world"]), sent_len=15).collect()[0]
    assert (r["sent_id"], r["degree"], r["n_sents"]) == (0, 0, 1)


def test_lexrank_hub_sentence_wins(spark):
    # s1 shares terms with s0 AND s2; s0,s2 are disjoint -> s1 degree 2 wins
    txt = "a b p q r s a b c d x y c d m n"
    #     s0: a b p q | s1: r s a b | wait — craft explicitly with sent_len=4
    txt = "a b p q a b c d c d m n"
    r = lexrank_top_sentences(_docs(spark, [txt]), sent_len=4).collect()[0]
    assert (r["sent_id"], r["degree"], r["n_sents"]) == (1, 2, 3)


def test_lexrank_rejects_bad_sent_len(spark):
    with pytest.raises(ValueError):
        lexrank_top_sentences(_docs(spark, ["x"]), sent_len=0)
