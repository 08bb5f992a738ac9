"""Sandbox-module tests: SlowFuzzy, FuzzyLikeThis, SortedSetSortField,
TermsFilter (Lucene.Net.Sandbox/Queries + Queries/TermsFilter.cs)."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.sandbox import (
    SlowFuzzyQuery,
    fuzzy_like_this,
    slow_fuzzy_candidates,
    slow_fuzzy_rewrite,
    sorted_set_sort_field,
    terms_filter,
)
from lucenenet_spark.search.searcher import IndexSearcher


DOCS = [
    (0, "table tables tame tale tuple merge"),
    (1, "table stable cable fable merge merged"),
    (2, "tablet tabled label enable scan"),
    (3, "zebra quokka walrus"),
]


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_index(df, text_col="text", id_col="doc_id").cache()
    return idx, IndexSearcher(idx, mode="double")


def _py_sim(term: str, target: str) -> float:
    # plain Levenshtein
    m, n = len(term), len(target)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (term[i - 1] != target[j - 1]))
        prev = cur
    return 1.0 - prev[n] / min(m, n)


def test_slow_fuzzy_candidates_threshold_and_boost(engine):
    idx, _ = engine
    got = slow_fuzzy_candidates(idx.term_stats, "tabl", min_similarity=0.5)
    terms = {t for t, _b, _d in got}
    # every returned term passes the threshold; every dictionary term that
    # passes is returned
    all_terms = [r["term"] for r in idx.term_stats.collect()]
    expect = {t for t in all_terms if _py_sim(t, "tabl") > 0.5}
    assert terms == expect
    for t, b, _df in got:
        sim = _py_sim(t, "tabl")
        assert b == pytest.approx((sim - 0.5) / 0.5, rel=1e-12)


def test_slow_fuzzy_rewrite_scores_and_nomatch(engine):
    idx, s = engine
    q = slow_fuzzy_rewrite(s, SlowFuzzyQuery(term="tabl"))
    hits = {r["doc_id"] for r in s.scored(q).collect()}
    passing = {
        t for d, text in DOCS for t in text.split() if _py_sim(t, "tabl") > 0.5
    }
    expect = {d for d, text in DOCS if passing & set(text.split())}
    assert passing == {"table"} and hits == expect == {0, 1}
    nomatch = slow_fuzzy_rewrite(s, SlowFuzzyQuery(term="xyzzyplugh"))
    assert s.scored(nomatch).count() == 0


def test_slow_fuzzy_min_similarity_validation(engine):
    idx, _ = engine
    with pytest.raises(ValueError):
        slow_fuzzy_candidates(idx.term_stats, "tabl", min_similarity=1.0)


def test_fuzzy_like_this_df_fallback_and_scores(engine):
    idx, s = engine
    out = {r["doc_id"]: r["score"] for r in fuzzy_like_this(s, "tabl tablet").collect()}
    # variants: 'table'/'tables' (from tabl), 'tablet'/'tabled'/'tables'
    # (from tablet) -> docs 0, 1 (table*), 2 (tablet/tabled)
    assert set(out) == {0, 1, 2}
    # source term 'tabl' absent from the index -> df falls back to the avg
    # variant df; every matched doc's score is a sum of boost^2*idf > 0
    assert all(v > 0 for v in out.values())
    # doc 0 matches table+tables, doc 2 only the tablet-family variants of
    # a present source term (lower boosts than exact 'tablet')
    assert out[0] != out[2]


def test_fuzzy_like_this_empty_query(engine):
    _, s = engine
    assert fuzzy_like_this(s, "the of and").count() == 0  # all stopwords


def test_sorted_set_sort_field_rows_and_array(spark):
    rows = spark.createDataFrame(
        [(1, "m"), (1, "a"), (2, "b"), (2, "z"), (3, "c")], "doc_id long, v string"
    )
    got = sorted_set_sort_field(rows, value_col="v", selector="min", k=3).collect()
    assert [(r["doc_id"], r["sort_key"]) for r in got] == [(1, "a"), (2, "b"), (3, "c")]
    got_max = sorted_set_sort_field(
        rows, value_col="v", selector="max", ascending=False, k=3
    ).collect()
    assert [(r["doc_id"], r["sort_key"]) for r in got_max] == [(2, "z"), (1, "m"), (3, "c")]

    arr = spark.createDataFrame(
        [(1, ["m", "a"]), (2, ["b", "z"])], "doc_id long, v array<string>"
    )
    got_arr = sorted_set_sort_field(arr, value_col="v", selector="min", k=2).collect()
    assert [(r["doc_id"], r["sort_key"]) for r in got_arr] == [(1, "a"), (2, "b")]

    with pytest.raises(ValueError):
        sorted_set_sort_field(rows, value_col="v", selector="median")


def test_terms_filter(engine):
    idx, _ = engine
    got = {r["doc_id"] for r in terms_filter(idx, ["merge", "scan"]).collect()}
    assert got == {0, 1, 2}
    assert terms_filter(idx, ["nosuchterm"]).count() == 0
