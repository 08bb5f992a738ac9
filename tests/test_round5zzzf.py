"""Round-5 part-zzzf twins: Condorcet (Copeland) fusion and greedy set cover."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from lucenenet_spark.functions.sampling import greedy_set_cover
from lucenenet_spark.search.hybrid import condorcet_fuse


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def _py_copeland(rankings, topk):
    big = 1 << 40
    cands = sorted({d for r in rankings for d, _ in r})
    pos = [dict(r) for r in rankings]
    wins = {d: 0 for d in cands}
    ties = {d: 0 for d in cands}
    for a, b in itertools.permutations(cands, 2):
        na = sum(1 for p in pos if p.get(a, big) < p.get(b, big))
        nb = sum(1 for p in pos if p.get(b, big) < p.get(a, big))
        if na > nb:
            wins[a] += 1
        elif na == nb:
            ties[a] += 1
    rows = [(d, 2 * wins[d] + ties[d], wins[d], ties[d]) for d in cands]
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:topk]


def test_condorcet_replica_three_systems(spark):
    r0 = _ranking(spark, [(1, 1), (2, 2), (3, 3), (4, 4)])
    r1 = _ranking(spark, [(2, 1), (1, 2), (5, 3)])
    r2 = _ranking(spark, [(5, 1), (2, 2), (3, 3), (1, 4)])
    got = [
        (r["doc_id"], r["copeland_2x"], r["wins"], r["ties"])
        for r in condorcet_fuse([r0, r1, r2], topk=10).collect()
    ]
    want = _py_copeland(
        [[(1, 1), (2, 2), (3, 3), (4, 4)], [(2, 1), (1, 2), (5, 3)],
         [(5, 1), (2, 2), (3, 3), (1, 4)]],
        10,
    )
    assert got == want


def test_condorcet_unanimous_winner_first(spark):
    # doc 7 ranked first by both systems -> beats everyone -> max Copeland.
    r0 = _ranking(spark, [(7, 1), (1, 2), (2, 3)])
    r1 = _ranking(spark, [(7, 1), (2, 2), (3, 3)])
    rows = condorcet_fuse([r0, r1], topk=10).collect()
    assert rows[0]["doc_id"] == 7
    # 7 beats every one of the 3 other candidates (union {7,1,2,3}) outright.
    assert rows[0]["wins"] == 3 and rows[0]["ties"] == 0


def test_condorcet_absentees_tie_below(spark):
    # docs 3 (only in r0) and 4 (only in r1) at the same in-list rank:
    # each wins one system against the other -> 1-1 tie pairwise.
    r0 = _ranking(spark, [(1, 1), (3, 2)])
    r1 = _ranking(spark, [(1, 1), (4, 2)])
    rows = {r["doc_id"]: r for r in condorcet_fuse([r0, r1], topk=10).collect()}
    assert rows[3]["ties"] >= 1 and rows[4]["ties"] >= 1
    assert rows[1]["wins"] == 2  # beats both 3 and 4


def _py_greedy(sets, rounds):
    # sets: list of (sid, elem); returns [(round, sid, gain, covered_total)]
    by_sid = {}
    for s, e in set(sets):
        by_sid.setdefault(s, set()).add(e)
    covered, chosen, out = set(), set(), []
    for r in range(1, rounds + 1):
        best = None
        for sid in sorted(k for k in by_sid if k not in chosen):
            gain = len(by_sid[sid] - covered)
            if best is None or gain > best[1]:
                best = (sid, gain)
        # a set with zero uncovered elements has no rows in the anti-join,
        # so the engine emits no winner once coverage saturates
        if best is None or best[1] == 0:
            break
        covered |= by_sid[best[0]]
        chosen.add(best[0])
        out.append((r, best[0], best[1], len(covered)))
    return out


def test_set_cover_replica(spark):
    pairs = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "c"), (2, "d"),
        (3, "d"), (3, "e"), (3, "f"), (3, "a"),
        (4, "g"),
    ]
    df = spark.createDataFrame(pairs, "doc_id long, shingle string")
    got = [
        (r["round"], r["doc_id"], r["gain"], r["covered_total"])
        for r in greedy_set_cover(df, rounds=4).orderBy("round").collect()
    ]
    assert got == _py_greedy(pairs, 4)


def test_set_cover_tie_breaks_by_id(spark):
    # docs 1 and 2 both have gain 2 in round 1 -> smallest id wins.
    pairs = [(2, "x"), (2, "y"), (1, "p"), (1, "q")]
    df = spark.createDataFrame(pairs, "doc_id long, shingle string")
    rows = greedy_set_cover(df, rounds=2).orderBy("round").collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["gain"] == 2
    assert rows[1]["doc_id"] == 2 and rows[1]["covered_total"] == 4


def test_set_cover_monotone_coverage(spark):
    pairs = [(i, f"e{j}") for i in range(6) for j in range(i, i + 4)]
    df = spark.createDataFrame(pairs, "doc_id long, shingle string")
    rows = greedy_set_cover(df, rounds=5).orderBy("round").collect()
    gains = [r["gain"] for r in rows]
    cov = [r["covered_total"] for r in rows]
    assert len(rows) == 3  # rounds 4-5 saturate: no positive-gain set left
    assert gains == sorted(gains, reverse=True)  # submodular: gains non-increasing
    assert cov == sorted(cov) and len(set(r["doc_id"] for r in rows)) == len(rows)
    # coverage totals are exactly the cumulative gains
    assert cov == [sum(gains[: i + 1]) for i in range(len(gains))]
