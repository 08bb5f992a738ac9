"""Segmented build: crash/resume via lineage, merge parity with direct build
(the CheckIndex-style invariants + two-phase-commit behavior)."""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.index.segments import SegmentedIndexWriter


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "segidx")


def _fingerprint(idx):
    stats = sorted((r["term"], r["df"], r["ttf"]) for r in idx.term_stats.collect())
    lens = sorted((r["doc_id"], r["dl"], r["norm_byte"]) for r in idx.doclens.collect())
    return stats, lens, idx.max_doc, idx.sum_ttf


def test_crash_resume_and_merge_parity(spark, corpus_df, out_dir):
    w = SegmentedIndexWriter(out_dir=out_dir, num_segments=4)

    # simulated crash after 2 segments
    lineage = w.build(corpus_df, fail_after=2)
    committed = [k for k, v in lineage.items() if v["status"] == "committed"]
    assert len(committed) == 2
    assert not w.is_complete()

    # resume: only remaining segments build; previously committed are skipped
    lineage2 = w.build(corpus_df)
    assert w.is_complete()
    for k in committed:
        assert lineage2[k]["wall_sec"] == lineage[k]["wall_sec"]  # untouched

    merged = w.merge(spark)
    direct = build_index(corpus_df)
    assert _fingerprint(merged) == _fingerprint(direct)

    # searches over the merged (disk) index match the in-memory index
    s1 = IndexSearcher(merged).search(TermQuery("w0001"), 10).collect()
    s2 = IndexSearcher(direct).search(TermQuery("w0001"), 10).collect()
    assert [(r["doc_id"], r["score"]) for r in s1] == [(r["doc_id"], r["score"]) for r in s2]


def test_metrics_emitted(spark, corpus_df, out_dir):
    w = SegmentedIndexWriter(out_dir=out_dir, num_segments=2)
    w.build(corpus_df)
    m = w.metrics()
    assert m["segments"] == 2
    assert m["docs"] == corpus_df.count()
    assert m["docs_per_sec"] > 0
    assert m["postings"] > 0 and m["bytes"] > 0
