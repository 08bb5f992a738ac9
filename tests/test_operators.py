"""Collector/span/MLT/highlight/sloppy-phrase/multimodal operator tests."""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.functions import multimodal
from lucenenet_spark.oracle import PyIndex
from lucenenet_spark.search import collectors
from lucenenet_spark.search.highlight import highlight
from lucenenet_spark.search.mlt import more_like_this_query
from lucenenet_spark.search.queries import PhraseQuery
from lucenenet_spark.search.spans import span_first_docs, span_near_docs, span_not_docs

REL_TOL = 1e-6


@pytest.fixture(scope="module")
def eng(spark, corpus, corpus_df):
    idx = build_index(corpus_df).cache()
    meta = corpus_df.selectExpr("doc_id", "doc_id % 5 as grp", "length(text) as n_chars")
    return IndexSearcher(idx), PyIndex(corpus), meta


# ------------------------------------------------------------------ spans
@pytest.fixture(scope="module")
def span_idx(spark):
    docs = {
        0: "a1 b2 c3 d4 e5",
        1: "b2 a1 c3",
        2: "a1 x x x b2",
        3: "b2 x a1",
        4: "c3 only here",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return build_index(df).cache()


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_span_near_ordered(span_idx):
    assert _ids(span_near_docs(span_idx, ["a1", "b2"], slop=0, in_order=True)) == [0]
    assert _ids(span_near_docs(span_idx, ["a1", "b2"], slop=3, in_order=True)) == [0, 2]


def test_span_near_unordered(span_idx):
    assert _ids(span_near_docs(span_idx, ["a1", "b2"], slop=0, in_order=False)) == [0, 1]
    assert _ids(span_near_docs(span_idx, ["a1", "b2"], slop=1, in_order=False)) == [0, 1, 3]


def test_span_first(span_idx):
    assert _ids(span_first_docs(span_idx, "a1", 1)) == [0, 2]
    assert _ids(span_first_docs(span_idx, "b2", 1)) == [1, 3]


def test_span_not(span_idx):
    # docs with a1 where no 'x' within 1 position of it
    got = _ids(span_not_docs(span_idx, ["a1"], "x", dist=1))
    assert got == [0, 1]


# ------------------------------------------------------------- sloppy phrase
def test_sloppy_phrase_matches_oracle(eng):
    s, o, _ = eng
    q = PhraseQuery(terms=("quick", "fox"), slop=2)
    exp = o.sloppy_phrase_scores(["quick", "fox"], slop=2)
    got = {int(r["doc_id"]): float(r["score"]) for r in s.scored(q).collect()}
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=REL_TOL)


def test_sloppy_phrase_superset_of_exact(eng):
    s, o, _ = eng
    exact = {r["doc_id"] for r in s.scored(PhraseQuery(terms=("quick", "fox"))).collect()}
    sloppy = {r["doc_id"] for r in s.scored(PhraseQuery(terms=("quick", "fox"), slop=3)).collect()}
    assert exact <= sloppy


# ------------------------------------------------------------- collectors
def test_facets_and_ranges(eng):
    s, o, meta = eng
    fc = {r["grp"]: r["cnt"] for r in collectors.facet_counts(s, TermQuery("w0000"), meta, "grp").collect()}
    docs = set(o.term_scores("w0000"))
    exp = {}
    for d in docs:
        exp[d % 5] = exp.get(d % 5, 0) + 1
    assert fc == exp

    rc = {
        r["bucket"]: r["cnt"]
        for r in collectors.range_facet_counts(
            s, TermQuery("w0000"), meta, "n_chars", [("short", None, 500), ("long", 500, None)]
        ).collect()
    }
    assert sum(rc.values()) == len(docs)


def test_group_topk_and_sort(eng):
    s, o, meta = eng
    rows = collectors.group_topk(s, TermQuery("w0000"), meta, "grp", k_per_group=2).collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["grp"], []).append((r["doc_id"], r["score"]))
    scores = o.term_scores("w0000")
    for g, pairs in per_group.items():
        exp = sorted(
            ((d, sc) for d, sc in scores.items() if d % 5 == g),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2]
        got = sorted(pairs, key=lambda kv: (-kv[1], kv[0]))
        assert [d for d, _ in got] == [d for d, _ in exp]

    top = collectors.sort_topk(s, TermQuery("w0000"), meta, [("n_chars", False)], k=5).collect()
    assert len(top) == 5
    chars = [r["n_chars"] for r in top]
    assert chars == sorted(chars, reverse=True)


def test_rescore(eng):
    s, o, _ = eng
    out = collectors.rescore(s, TermQuery("w0000"), TermQuery("w0001"), n=50, k=10).collect()
    exp_first = o.term_scores("w0000")
    exp_second = o.term_scores("w0001")
    top50 = o.topk(exp_first, 50)
    combined = {d: sc + exp_second.get(d, 0.0) for d, sc in top50}
    exp = o.topk(combined, 10)
    got = [(r["doc_id"], r["score"]) for r in out]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (d1, s1), (d2, s2) in zip(got, exp):
        assert s1 == pytest.approx(s2, rel=1e-5)


# ------------------------------------------------------------- MLT
def test_more_like_this(eng, spark):
    s, o, _ = eng
    q = more_like_this_query(s.index, doc_id=0, max_query_terms=10, min_term_freq=1, min_doc_freq=2)
    assert len(q.clauses) > 0
    hits = s.search(q, 10).collect()
    assert hits and hits[0]["doc_id"] == 0  # the source doc is its own best match


# ------------------------------------------------------------- highlight
def test_highlight(spark):
    df = spark.createDataFrame(
        [(0, "The quick brown fox jumps"), (1, "nothing to see"), (2, "fox Fox FOX!")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in highlight(df, ["fox"], fragment_tokens=3).collect()}
    assert rows[0]["n_hits"] == 1 and "<b>fox</b>" in rows[0]["fragment"]
    assert rows[1]["n_hits"] == 0 and rows[1]["fragment"] is None
    assert rows[2]["n_hits"] == 3
    assert rows[2]["fragment"] == "<b>fox</b> <b>Fox</b> <b>FOX!</b>"


# ------------------------------------------------------------- multimodal
def test_multimodal_plumbing(spark):
    rows = [
        (0, b"\x01" * 200, "image/fake", 10, 20),
        (1, b"\x02" * 100, "image/fake", 5, 5),
        (2, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert feats[0]["n_bytes"] == 200 and len(feats[0]["feature"]) == 8
    assert feats[2]["feature"] is None
    # determinism
    feats2 = {r["media_id"]: r for r in multimodal.extract_features(media, dim=8).collect()}
    assert feats[0]["feature"] == feats2[0]["feature"]

    frames = multimodal.sample_frames(media, every_n_bytes=64, max_frames=4).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[0]) == 3  # 200 // 64
    assert len(by_id[1]) == 1
    assert 2 not in by_id

    stats = {r["mime"]: (r["n_items"], r["total_bytes"]) for r in multimodal.media_stats(media).collect()}
    assert stats["image/fake"] == (2, 300)

    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, decoder="pillow")


# ------------------------------------------------- docset MUST+SHOULD (regression)
def test_docset_must_with_optional_should(spark):
    """Regression: docset()/count() for MUST+SHOULD with msm=0 must treat
    SHOULD as purely optional (BooleanScorer2 semantics), matching scored().
    Previously the SHOULD union was always semi-joined, shrinking the set."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    docs = {0: "w1 w2 w3 w4 w5", 1: "w1 w3 w2 w3", 2: "w1 xx w2 yy w3", 3: "w1 w3 xx w2 yy w3"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    s = IndexSearcher(build_index(df))
    q = BooleanQuery.of((TermQuery("w1"), Occur.MUST), (TermQuery("w5"), Occur.SHOULD))
    scored_ids = sorted(r["doc_id"] for r in s.scored(q).collect())
    docset_ids = sorted(r["doc_id"] for r in s.docset(q).collect())
    assert scored_ids == [0, 1, 2, 3]
    assert docset_ids == scored_ids
    assert s.count(q) == 4
    # msm=1 restores the requirement
    q1 = BooleanQuery.of(
        (TermQuery("w1"), Occur.MUST), (TermQuery("w5"), Occur.SHOULD),
        minimum_should_match=1,
    )
    assert sorted(r["doc_id"] for r in s.docset(q1).collect()) == [0]
