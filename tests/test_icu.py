"""ICU folding tests (Lucene.Net.Analysis.Icu/ICUFoldingFilter.cs subset)."""

from __future__ import annotations

import pandas as pd
import pytest

from lucenenet_spark.analysis.icu import ICUFoldingAnalyzer, fold_icu_series, icu_fold


FOLD_CASES = [
    ("Mérgé", "merge"),            # accents + case
    ("ÀÉÎÕÜ", "aeiou"),            # precomposed uppercase accents
    ("àé", "ae"),      # combining sequences (NFD input)
    ("ﬁle", "file"),               # compatibility ligature (NFKC)
    ("Straße", "strasse"),         # full case fold expands ß
    ("ΣΊΣΥΦΟΣ", "σισυφοσ"),        # case folding maps every Σ to σ
    ("ｆｕｌｌｗｉｄｔｈ", "fullwidth"),  # full-width compatibility chars
    ("café", "cafe"),
    ("İstanbul", "i̇stanbul"[:1] + "stanbul"),  # NFKC+casefold of dotted I
    ("hello", "hello"),
    ("", ""),
]


@pytest.mark.parametrize("raw,folded", FOLD_CASES, ids=[c[0] or "empty" for c in FOLD_CASES])
def test_icu_fold(raw, folded):
    assert icu_fold(raw) == folded
    # idempotent
    assert icu_fold(icu_fold(raw)) == icu_fold(raw)


def test_fold_series_matches_scalar():
    vals = [c[0] for c in FOLD_CASES] + [None]
    out = fold_icu_series(pd.Series(vals, dtype=object))
    for raw, got in zip(vals, out):
        if raw is None:
            assert got is None
        else:
            assert got == icu_fold(raw)


def test_folding_analyzer_restores_plain_index(spark):
    """Indexing accent-decorated text through ICUFoldingAnalyzer must give
    the same postings as the plain text through StandardAnalyzer."""
    from lucenenet_spark.analysis.analyzers import StandardAnalyzer
    from lucenenet_spark.index.builder import build_index

    plain = [(0, "the quick brown fox jumps over lazy dogs"),
             (1, "merge sort and quick sort differ in locality")]
    table = str.maketrans("aeiou", "àéîõü")
    accented = [(i, t.translate(table).upper()) for i, t in plain]

    df_p = spark.createDataFrame(plain, "doc_id long, text string")
    df_a = spark.createDataFrame(accented, "doc_id long, text string")
    ix_p = build_index(df_p, analyzer=StandardAnalyzer())
    ix_a = build_index(df_a, analyzer=ICUFoldingAnalyzer())

    post_p = {(r["doc_id"], r["term"], r["tf"]) for r in ix_p.postings.collect()}
    post_a = {(r["doc_id"], r["term"], r["tf"]) for r in ix_a.postings.collect()}
    assert post_p == post_a
    # stopwords in decorated text ('thé' etc.) were recognized and dropped
    terms_a = {t for _, t, _ in post_a}
    assert "the" not in terms_a and "and" not in terms_a and "over" in terms_a
