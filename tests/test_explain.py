"""Explain consistency: explain().score must equal the scorer's score —
the CheckHits.VerifyExplanation contract
(reference TestFramework/Search/CheckHits.cs:290)."""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index


@pytest.fixture(scope="module")
def eng(spark, corpus_df):
    idx = build_index(corpus_df).cache()
    return IndexSearcher(idx)


def test_explain_matches_score(eng):
    rows = eng.search(TermQuery("w0001"), 5).collect()
    assert rows
    for r in rows:
        ex = eng.explain("w0001", int(r["doc_id"]))
        assert ex is not None
        assert ex["score"] == pytest.approx(float(r["score"]), rel=1e-7)
        assert ex["tf"] >= 1 and ex["df"] >= 1 and ex["idf"] > 0


def test_explain_missing_doc(eng):
    assert eng.explain("w0001", 10_000_000) is None


def test_search_text(eng):
    a = [(r["doc_id"], r["score"]) for r in eng.search_text("+w0000 +w0001", 10).collect()]
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    q = BooleanQuery.of((TermQuery("w0000"), Occur.MUST), (TermQuery("w0001"), Occur.MUST))
    b = [(r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    assert a == b
