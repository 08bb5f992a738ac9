"""Round-5 part-zzf twins: minimal-interval semantics (ordered,
unordered, maxgaps) vs a brute-force containment replica."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.intervals import (
    interval_doc_stats,
    minimal_ordered_intervals,
    minimal_unordered_intervals,
)


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def _brute_minimal(tokens, terms, ordered):
    """All minimal intervals by exhaustive containment check."""
    cands = []
    n = len(tokens)
    for s in range(n):
        for e in range(s, n):
            window = tokens[s : e + 1]
            if ordered:
                it = iter(window)
                ok = all(t in it for t in terms)
            else:
                ok = all(t in window for t in terms)
            if ok and tokens[s] in terms and tokens[e] in terms:
                cands.append((s, e))
    return sorted(
        (s, e)
        for (s, e) in cands
        if not any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for (s2, e2) in cands
        )
    )


def _engine_intervals(spark, texts, terms, ordered):
    idx = _index(spark, texts)
    if ordered:
        iv = minimal_ordered_intervals(idx, list(terms))
    else:
        iv = minimal_unordered_intervals(idx, *terms)
    out = {}
    for r in iv.collect():
        out.setdefault(r["doc_id"], []).append((r["s"], r["e"]))
    return {d: sorted(v) for d, v in out.items()}


def test_ordered_two_term_replica(spark):
    texts = [
        "alpha beta alpha alpha beta",
        "beta alpha",
        "alpha gamma gamma beta alpha beta",
        "gamma gamma",
        "alpha alpha beta beta alpha beta alpha",
    ]
    got = _engine_intervals(spark, texts, ("alpha", "beta"), ordered=True)
    for d, text in enumerate(texts):
        want = _brute_minimal(text.split(), ("alpha", "beta"), ordered=True)
        assert got.get(d, []) == want, (d, got.get(d), want)


def test_ordered_three_term_replica(spark):
    texts = [
        "x y z",
        "x x y y z z x y z",
        "z y x",
        "x q y q q z x z y x y q z",
        "y z x y x z y z",
    ]
    got = _engine_intervals(spark, texts, ("x", "y", "z"), ordered=True)
    for d, text in enumerate(texts):
        want = _brute_minimal(text.split(), ("x", "y", "z"), ordered=True)
        assert got.get(d, []) == want, (d, got.get(d), want)


def test_unordered_replica(spark):
    texts = [
        "alpha beta",
        "beta gamma alpha",
        "alpha alpha beta alpha beta beta",
        "beta q q alpha q beta alpha",
        "gamma gamma gamma",
        "alpha q q q beta",
    ]
    got = _engine_intervals(spark, texts, ("alpha", "beta"), ordered=False)
    for d, text in enumerate(texts):
        want = _brute_minimal(text.split(), ("alpha", "beta"), ordered=False)
        assert got.get(d, []) == want, (d, got.get(d), want)


def test_minimality_no_containment(spark):
    texts = ["x q x y q y x y", "x x x y y y"]
    got = _engine_intervals(spark, texts, ("x", "y"), ordered=True)
    for ivs in got.values():
        for s1, e1 in ivs:
            assert not any(
                (s2, e2) != (s1, e1) and s1 <= s2 and e2 <= e1 for s2, e2 in ivs
            )


def test_maxgaps_filter_and_stats(spark):
    # doc 0: intervals (0,1) gap 0 and (3,6) gap 2; doc 1: gap 3 only
    texts = ["x y q x q q y", "x q q q y"]
    idx = _index(spark, texts)
    iv = minimal_ordered_intervals(idx, ["x", "y"])
    rows = {r["doc_id"]: r for r in interval_doc_stats(iv, 2, max_gaps=2).collect()}
    assert rows[0]["n_intervals"] == 2
    assert rows[0]["width_sum"] == 1 + 3
    assert rows[0]["min_width"] == 1
    assert 1 not in rows  # gap 3 > 2 filtered out


def test_stopword_holes_count_as_gaps(spark):
    # 'the' is a stop word: removed from tokens but keeps its position,
    # so it widens the interval exactly like any other gap token.
    texts = ["x the y"]
    idx = _index(spark, texts)
    iv = minimal_ordered_intervals(idx, ["x", "y"]).collect()
    assert [(r["s"], r["e"]) for r in iv] == [(0, 2)]


def test_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        minimal_ordered_intervals(idx, ["x"])
    with pytest.raises(ValueError):
        minimal_ordered_intervals(idx, ["x", "x"])
    with pytest.raises(ValueError):
        minimal_unordered_intervals(idx, "x", "x")
