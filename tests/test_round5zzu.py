"""Round-5 part-zzu twins: vocabulary coverage curve and stopword
induction."""

from __future__ import annotations

import pytest

from lucenenet_spark.functions.textstats import stopword_induction, vocab_coverage_curve
from lucenenet_spark.index.builder import build_index


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def test_coverage_replica(spark):
    # ttf: big 6, mid 3, low 1 x 4 fillers -> total 13
    texts = ["big big big mid", "big big mid f1 f2", "big mid f3 f4"]
    idx = _index(spark, texts)
    rows = {r["vocab_size"]: r for r in vocab_coverage_curve(idx, (1, 2, 4, 100)).collect()}
    assert rows[1]["covered_tokens"] == 6
    assert rows[2]["covered_tokens"] == 9
    assert rows[4]["covered_tokens"] == 11  # + f1, f2 (alphabetical ties)
    # V beyond the dictionary covers everything
    assert rows[100]["covered_tokens"] == rows[100]["total_tokens"] == 13
    assert rows[100]["n_terms_total"] == 6


def test_coverage_monotone(spark):
    texts = ["a1 a2 a3 a1 a1 a2", "a4 a5 a1"]
    idx = _index(spark, texts)
    rows = sorted(
        vocab_coverage_curve(idx, (1, 2, 3, 4, 5)).collect(),
        key=lambda r: r["vocab_size"],
    )
    cov = [r["covered_tokens"] for r in rows]
    assert cov == sorted(cov)


def test_coverage_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        vocab_coverage_curve(idx, ())
    with pytest.raises(ValueError):
        vocab_coverage_curve(idx, (0,))


def test_stopword_induction_threshold(spark):
    # 'everywhere' in 4/4 docs; 'half' in 2/4; 'rare' in 1/4
    texts = [
        "everywhere half q1", "everywhere half q2",
        "everywhere q3", "everywhere rare q4",
    ]
    idx = _index(spark, texts)
    rows = {r["term"]: r for r in stopword_induction(idx, 0.5).collect()}
    assert "everywhere" in rows and rows["everywhere"]["pct_docs_q4"] == 10000
    assert "half" not in rows  # exactly 0.5 is NOT above the threshold
    assert "rare" not in rows
    loose = {r["term"] for r in stopword_induction(idx, 0.4).collect()}
    assert "half" in loose


def test_stopword_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        stopword_induction(idx, 0.0)
    with pytest.raises(ValueError):
        stopword_induction(idx, 1.0)
