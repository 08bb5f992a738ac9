"""ReversedTermIndex / ReversedAnalyzer tests (leading wildcards)."""

import pandas as pd
import pytest

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.search.reversed import (
    ReversedAnalyzer,
    ReversedTermIndex,
)


@pytest.fixture(scope="module")
def rev_index(spark):
    from lucenenet_spark.index.builder import build_index

    df = spark.createDataFrame(
        [(0, "spark work dup"), (1, "walk fast dup"), (2, "sparkle")],
        "doc_id long, text string",
    )
    return ReversedTermIndex(build_index(df))


def test_leading_wildcard_docsets(rev_index):
    assert sorted(r.doc_id for r in rev_index.docset("*rk").collect()) == [0]
    assert sorted(r.doc_id for r in rev_index.docset("*alk").collect()) == [1]
    assert sorted(r.doc_id for r in rev_index.docset("*kle").collect()) == [2]
    assert rev_index.docset("*zzz").count() == 0


def test_prefix_predicate_reaches_the_plan(rev_index):
    plan = (
        rev_index.docset("*rk")._jdf.queryExecution().executedPlan().toString()
    )
    assert "StartsWith" in plan  # not an rlike full scan


def test_non_leading_patterns_rejected(rev_index):
    for bad in ("rk", "*a*b", "*a?b", "a*"):
        with pytest.raises(ValueError):
            rev_index.docset(bad)


def test_reversed_analyzer_reverses_tokens():
    ra = ReversedAnalyzer(StandardAnalyzer(stopwords=None))
    _, t, p, fl = ra.tokenize_batch(pd.Series(["spark walk"]))
    assert list(t) == ["kraps", "klaw"]
    assert list(p) == [0, 1]
    assert list(fl) == [2]
