"""Property-based invariants (hypothesis) for the round-5 operators.

All driver-side (no Spark session): analyzer kernels, the JaroWinkler
port, and the URL canonicalization formula (evaluated through DuckDB,
which runs the identical RE2 expression the oracles use).
"""

from __future__ import annotations

import string

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucenenet_spark.analysis.classic import ClassicAnalyzer, classic_filter_series
from lucenenet_spark.analysis.worddelim import WordDelimiterAnalyzer, split_subwords
from lucenenet_spark.functions.urls import canonical_url_sql_expr
from lucenenet_spark.search.distances import jaro_winkler

_token = st.text(
    alphabet=string.ascii_letters + string.digits + "-_.'&,/",
    min_size=1,
    max_size=24,
)


@given(_token)
@settings(max_examples=300, deadline=None)
def test_wdf_parts_preserve_alnum_chars(tok):
    """Subword split never invents or drops alphanumeric characters."""
    parts = split_subwords(tok)
    assert "".join(parts) == "".join(c for c in tok if c.isalnum())
    assert all(p and all(c.isalnum() for c in p) for p in parts)


@given(st.lists(_token, min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_wdf_positions_strictly_increase(toks):
    """Emitted positions are non-decreasing and posIncr>=1 tokens strictly
    advance — no position is ever reused by two advancing tokens."""
    a = WordDelimiterAnalyzer(stopwords=None)
    out = a.tokenize_text(" ".join(toks))
    seen = [p for _, p in out]
    assert seen == sorted(seen)
    assert len(set(seen)) == len(seen)  # default flags emit no overlaps


@given(_token)
@settings(max_examples=300, deadline=None)
def test_classic_never_errors_and_bounded(tok):
    toks = ClassicAnalyzer(stopwords=None).tokenize_text(tok + " plain")
    assert all(len(t) <= 255 for t, _ in toks)
    assert toks and toks[-1][0] == "plain"


@given(st.lists(_token, min_size=1, max_size=6))
@settings(max_examples=150, deadline=None)
def test_classic_filter_idempotent(toks):
    import pandas as pd

    s = pd.Series(toks)
    once = classic_filter_series(s)
    twice = classic_filter_series(once)
    assert once.tolist() == twice.tolist()


_word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=12)


@given(_word, _word)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_bounds_and_symmetry(a, b):
    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0 + 1e-12
    assert abs(v - jaro_winkler(b, a)) < 1e-12
    assert jaro_winkler(a, a) == 1.0


_urlish = st.builds(
    lambda scheme, www, host, port, path, slashes, frag: (
        scheme + "://" + www + host + port + "/" + path + slashes + frag
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["", "www.", "WWW."]),
    st.text(alphabet=string.ascii_letters + string.digits + ".-", min_size=1, max_size=12).filter(
        lambda h: not h.startswith(".")
    ),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.text(alphabet=string.ascii_letters + string.digits + "/._-", max_size=16),
    st.sampled_from(["", "/", "//"]),
    st.sampled_from(["", "#f", "#a/b"]),
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@given(_urlish)
@settings(max_examples=200, deadline=None)
def test_canonical_url_idempotent(u):
    """canon(canon(u)) == canon(u) under the exact oracle expression."""
    c = duckdb.connect()
    expr = canonical_url_sql_expr("url")
    once = c.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [u]).fetchone()[0]
    twice = c.execute(f"SELECT {expr} FROM (SELECT ? AS url)", [once]).fetchone()[0]
    assert once == twice
