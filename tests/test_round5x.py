"""Round-5 part-x twins: team-draft interleaving, crawl scheduling,
mirror-host detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.crawl import crawl_schedule, mirror_hosts
from lucenenet_spark.search.interleave import team_draft_interleave


def _mk_ranking(spark, ids):
    return spark.createDataFrame(
        [(d, r + 1) for r, d in enumerate(ids)], "doc_id long, rank long"
    )


def _py_team_draft(a: list[int], b: list[int], k: int = 10):
    picked: set[int] = set()
    out = []
    for i in range(1, 2 * k + 1):
        rnd = (i + 1) // 2
        team_a = (rnd % 2 == 1) == (i % 2 == 1)
        lst = a if team_a else b
        pick = next((d for d in lst if d not in picked), None)
        if pick is not None:
            picked.add(pick)
            out.append((len(out) + 1, pick, "A" if team_a else "B"))
    return out


# ------------------------------------------------------------ team draft
def test_team_draft_disjoint_lists_abba_pattern(spark):
    a = [1, 2, 3, 4]
    b = [11, 12, 13, 14]
    got = [
        (r["pos"], r["doc_id"], r["team"])
        for r in team_draft_interleave(
            _mk_ranking(spark, a), _mk_ranking(spark, b), k=4
        ).orderBy("pos").collect()
    ]
    assert got == _py_team_draft(a, b, k=4)
    # ABBA: A B B A A B B A
    assert [t for _, _, t in got] == ["A", "B", "B", "A", "A", "B", "B", "A"]
    assert [d for _, d, _ in got] == [1, 11, 12, 2, 3, 13, 14, 4]


def test_team_draft_identical_lists(spark):
    a = [5, 6, 7]
    got = [
        (r["doc_id"], r["team"])
        for r in team_draft_interleave(
            _mk_ranking(spark, a), _mk_ranking(spark, a), k=3
        ).orderBy("pos").collect()
    ]
    assert got == [(d, t) for _, d, t in _py_team_draft(a, a, k=3)]
    assert [d for d, _ in got] == [5, 6, 7]  # each doc appears once
    assert [t for _, t in got] == ["A", "B", "B"]  # credit alternates by pick


def test_team_draft_partial_overlap_matches_replica(spark):
    a = [1, 2, 3, 4, 5]
    b = [3, 1, 9, 2, 8]
    got = [
        (r["pos"], r["doc_id"], r["team"])
        for r in team_draft_interleave(
            _mk_ranking(spark, a), _mk_ranking(spark, b), k=5
        ).orderBy("pos").collect()
    ]
    assert got == _py_team_draft(a, b, k=5)


# ------------------------------------------------------------ crawl schedule
def _hosted(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_crawl_schedule_politeness_and_priority(spark):
    docs = _hosted(
        spark,
        [
            (0, "t", "h1", 100),
            (1, "t", "h1", 300),
            (2, "t", "h2", 200),
            (3, "t", "h2", 50),
            (4, "t", "h3", 250),
        ],
    )
    rows = crawl_schedule(docs, k=50).orderBy("schedule_pos").collect()
    # round 1: one per host, ordered by priority desc: d1(300), d4(250), d2(200)
    # round 2: d0(100), d3(50)
    assert [(r["schedule_pos"], r["doc_id"], r["fetch_round"]) for r in rows] == [
        (1, 1, 1),
        (2, 4, 1),
        (3, 2, 1),
        (4, 0, 2),
        (5, 3, 2),
    ]
    # politeness: a host never appears twice in one round
    seen = {}
    for r in rows:
        key = (r["fetch_round"], r["host"])
        assert key not in seen
        seen[key] = True


def test_crawl_schedule_k_cutoff(spark):
    docs = _hosted(spark, [(i, "t", f"h{i % 3}", i) for i in range(30)])
    assert crawl_schedule(docs, k=7).count() == 7


# ------------------------------------------------------------ mirror hosts
def test_mirror_hosts_true_mirror_tops_ranking(spark):
    text_m = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, text_m, "mirror-a"),
            (1, text_m, "mirror-b"),
            (2, "alpha beta gamma other words here", "partial"),
            (3, "completely unrelated content lives here now", "lonely"),
        ],
        "doc_id long, text string, source string",
    )
    rows = mirror_hosts(docs, top=10).collect()
    top = rows[0]
    assert (top["host_a"], top["host_b"]) == ("mirror-a", "mirror-b")
    assert top["jaccard_q6"] == 1_000_000
    assert top["inter"] == top["n_a"] == top["n_b"] == 4  # 6 tokens -> 4 shingles
    # partial overlaps each mirror on exactly one shingle ('alpha beta gamma')
    partials = {
        (r["host_a"], r["host_b"]): r for r in rows[1:]
    }
    pr = partials[("mirror-a", "partial")]
    assert pr["inter"] == 1 and pr["n_b"] == 4
    assert pr["jaccard_q6"] == round(1 / 7 * 1e6)
    assert all("lonely" not in p for p in partials)


def test_mirror_hosts_no_self_pairs_and_ordering(spark):
    docs = spark.createDataFrame(
        [(i, "x y z w " + f"u{i}", f"h{i % 3}") for i in range(9)],
        "doc_id long, text string, source string",
    )
    rows = mirror_hosts(docs, top=10).collect()
    for r in rows:
        assert r["host_a"] < r["host_b"]
    jacs = [r["jaccard_q6"] for r in rows]
    assert jacs == sorted(jacs, reverse=True)
