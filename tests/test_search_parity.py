"""Differential tests: Spark engine vs pure-Python oracle (CheckHits-style,
reference src/Lucene.Net.TestFramework/Search/CheckHits.cs) plus golden
doc-set tests on the TestBoolean2 micro-corpus
(src/Lucene.Net.Tests/Search/TestBoolean2.cs:141-149)."""

import math

import numpy as np
import pytest

from lucenenet_spark import (
    BooleanQuery,
    IndexSearcher,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    build_index,
)
from lucenenet_spark.oracle import PyIndex
from lucenenet_spark.search.queries import Occur
from lucenenet_spark.queryparser import QueryParser

REL_TOL = 1e-6  # CheckHits.EXPLAIN_SCORE_TOLERANCE_DELTA spirit


@pytest.fixture(scope="module")
def engine(spark, corpus, corpus_df):
    idx = build_index(corpus_df).cache()
    return IndexSearcher(idx), PyIndex(corpus)


def _assert_topk_match(spark_rows, oracle_topk):
    got = [(int(r["doc_id"]), float(r["score"])) for r in spark_rows]
    assert [d for d, _ in got] == [d for d, _ in oracle_topk], (got, oracle_topk)
    for (d1, s1), (d2, s2) in zip(got, oracle_topk):
        assert s1 == pytest.approx(s2, rel=REL_TOL), (d1, s1, s2)


def test_global_stats_match(engine, corpus):
    s, o = engine
    assert s.index.max_doc == o.max_doc
    assert s.index.sum_ttf == o.sum_ttf
    stats = {r["term"]: (r["df"], r["ttf"]) for r in s.index.term_stats.collect()}
    assert len(stats) == len(o.postings)
    for t, docs in o.postings.items():
        df = len(docs)
        ttf = sum(len(p) for p in docs.values())
        assert stats[t] == (df, ttf), t


def test_norm_bytes_match(engine):
    s, o = engine
    got = {r["doc_id"]: r["norm_byte"] for r in s.index.doclens.collect()}
    assert got == o.norm_byte


def test_term_query_topk(engine, corpus):
    s, o = engine
    for term in ["w0000", "w0001", "w0042", "fox", "quick", "w0300"]:
        rows = s.search(TermQuery(term), k=10).collect()
        _assert_topk_match(rows, o.topk(o.term_scores(term), 10))


def test_term_query_all_scores(engine):
    s, o = engine
    got = {int(r["doc_id"]): float(r["score"]) for r in s.scored(TermQuery("w0001")).collect()}
    exp = o.term_scores("w0001")
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], rel=REL_TOL)


def test_boolean_and(engine):
    s, o = engine
    q = BooleanQuery.of((TermQuery("w0000"), Occur.MUST), (TermQuery("w0001"), Occur.MUST))
    exp = o.boolean(musts=[o.term_scores("w0000"), o.term_scores("w0001")])
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_boolean_or(engine):
    s, o = engine
    q = BooleanQuery.of((TermQuery("w0002"), Occur.SHOULD), (TermQuery("w0003"), Occur.SHOULD))
    exp = o.boolean(shoulds=[o.term_scores("w0002"), o.term_scores("w0003")])
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_boolean_not(engine):
    s, o = engine
    q = BooleanQuery.of((TermQuery("w0000"), Occur.MUST), (TermQuery("w0005"), Occur.MUST_NOT))
    exp = o.boolean(musts=[o.term_scores("w0000")], not_docs=set(o.term_scores("w0005")))
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_boolean_mixed_with_boost(engine):
    s, o = engine
    q = BooleanQuery.of(
        (TermQuery("w0000", boost=2.0), Occur.MUST),
        (TermQuery("w0002"), Occur.SHOULD),
        (TermQuery("w0009"), Occur.MUST_NOT),
    )
    exp = o.boolean(
        musts=[o.term_scores("w0000", boost=2.0)],
        shoulds=[o.term_scores("w0002")],
        not_docs=set(o.term_scores("w0009")),
    )
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_min_should_match(engine):
    s, o = engine
    terms = ["w0001", "w0002", "w0003"]
    q = BooleanQuery.of(
        *[(TermQuery(t), Occur.SHOULD) for t in terms], minimum_should_match=2
    )
    exp = o.boolean(shoulds=[o.term_scores(t) for t in terms], minimum_should_match=2)
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_phrase_query(engine, corpus):
    s, o = engine
    q = PhraseQuery(terms=("quick", "fox"))
    exp = o.phrase_scores(["quick", "fox"])
    assert exp, "fixture should contain the phrase"
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))


def test_match_all_count(engine, corpus):
    s, o = engine
    assert s.count(MatchAllDocsQuery()) == len(corpus)


def test_prefix_docset(engine):
    s, o = engine
    got = {int(r["doc_id"]) for r in s.docset(PrefixQuery("w000")).collect()}
    exp = set()
    for t, docs in o.postings.items():
        if t.startswith("w000"):
            exp |= set(docs)
    assert got == exp


def test_parser_roundtrip(engine):
    s, o = engine
    p = QueryParser()
    q = p.parse('+w0000 w0002 -w0009')
    exp = o.boolean(
        musts=[o.term_scores("w0000")],
        shoulds=[o.term_scores("w0002")],
        not_docs=set(o.term_scores("w0009")),
    )
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))

    q2 = p.parse('"the quick fox"')  # leading stopword -> positions (1,2) hole-aware
    assert isinstance(q2, PhraseQuery)
    assert q2.positions == (1, 2)


# ---------------------------------------------------------------- TestBoolean2
@pytest.fixture(scope="module")
def micro(spark):
    docs = {
        0: "w1 w2 w3 w4 w5",
        1: "w1 w3 w2 w3",
        2: "w1 xx w2 yy w3",
        3: "w1 w3 xx w2 yy w3",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return IndexSearcher(build_index(df).cache()), PyIndex(docs)


def _docs(searcher, q):
    return sorted(int(r["doc_id"]) for r in searcher.docset(q).collect())


def test_boolean2_golden_sets(micro):
    s, o = micro
    p = QueryParser()
    # golden sets in the style of TestBoolean2.QueriesTest
    assert _docs(s, p.parse("+w1 +w2")) == [0, 1, 2, 3]
    assert _docs(s, p.parse("+w1 +w5")) == [0]
    assert _docs(s, p.parse("+w3 -xx")) == [0, 1]
    assert _docs(s, p.parse("w5 xx")) == [0, 2, 3]
    assert _docs(s, p.parse('"w1 w2"')) == [0]
    assert _docs(s, p.parse('"w1 w3"')) == [1, 3]
    assert _docs(s, p.parse('"w2 w3"')) == [0, 1]


def test_boolean2_scores_match_oracle(micro):
    s, o = micro
    q = BooleanQuery.of((TermQuery("w1"), Occur.SHOULD), (TermQuery("xx"), Occur.SHOULD))
    exp = o.boolean(shoulds=[o.term_scores("w1"), o.term_scores("xx")])
    _assert_topk_match(s.search(q, 10).collect(), o.topk(exp, 10))
