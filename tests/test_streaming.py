"""NRT incremental indexing: micro-batch appends match a full rebuild, and a
real Structured Streaming file-source run produces the same index."""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur
from lucenenet_spark.streaming import IncrementalIndexer


def _topk(searcher, term="w0001", k=10):
    return [
        (r["doc_id"], r["score"]) for r in searcher.search(TermQuery(term), k).collect()
    ]


def test_microbatch_appends_match_full_build(spark, corpus_df, tmp_path):
    indexer = IncrementalIndexer(str(tmp_path / "nrt"))

    # three micro-batches (disjoint doc ranges, like arriving crawl chunks)
    b0 = corpus_df.filter("doc_id < 70")
    b1 = corpus_df.filter("doc_id >= 70 and doc_id < 150")
    b2 = corpus_df.filter("doc_id >= 150")

    indexer.process_batch(b0, 0)
    s = indexer.refresh(spark)
    partial = IndexSearcher(build_index(b0))
    assert _topk(s) == _topk(partial)  # NRT visibility of the first flush

    indexer.process_batch(b1, 1)
    indexer.process_batch(b1, 1)  # replay must be idempotent
    indexer.process_batch(b2, 2)

    s = indexer.refresh(spark)
    full = IndexSearcher(build_index(corpus_df))
    assert s.index.max_doc == full.index.max_doc
    assert s.index.sum_ttf == full.index.sum_ttf
    assert _topk(s) == _topk(full)
    q = BooleanQuery.of((TermQuery("w0000"), Occur.MUST), (TermQuery("w0002"), Occur.SHOULD))
    assert [
        (r["doc_id"], r["score"]) for r in s.search(q, 10).collect()
    ] == [(r["doc_id"], r["score"]) for r in full.search(q, 10).collect()]


def test_tiered_merge_preserves_results(spark, corpus_df, tmp_path):
    indexer = IncrementalIndexer(str(tmp_path / "nrt_merge"))
    # 12 small flushes of ~17 docs
    for i in range(12):
        indexer.process_batch(
            corpus_df.filter(f"doc_id % 12 = {i}"), i
        )
    full = IndexSearcher(build_index(corpus_df))
    before = _topk(indexer.refresh(spark))
    assert before == _topk(full)

    merged = indexer.maybe_merge(spark, max_segments=6, merge_factor=5)
    assert merged
    manifest = indexer._load_manifest()
    assert len(manifest) == 12 - 5 + 1
    after = indexer.refresh(spark)
    assert _topk(after) == before
    assert after.index.max_doc == full.index.max_doc
    # merging below the threshold is a no-op
    assert indexer.maybe_merge(spark, max_segments=20) is False


def test_structured_streaming_file_source(spark, corpus_df, tmp_path):
    src = str(tmp_path / "src")
    corpus_df.select("doc_id", "text").write.parquet(src)

    indexer = IncrementalIndexer(str(tmp_path / "nrt_stream"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(indexer.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    s = indexer.refresh(spark)
    full = IndexSearcher(build_index(corpus_df))
    assert s.index.max_doc == full.index.max_doc
    assert _topk(s) == _topk(full)


def test_merge_key_never_reused_after_regrow(spark, corpus_df, tmp_path):
    """Regression: merged-segment keys derived from len(manifest) collided
    after the manifest shrank (merge) and regrew (new batches), overwriting
    a surviving merged segment's parquet and silently dropping docs."""
    indexer = IncrementalIndexer(str(tmp_path / "nrt_regrow"))
    for i in range(11):
        indexer.process_batch(corpus_df.filter(f"doc_id % 15 = {i}"), i)
    assert indexer.maybe_merge(spark, max_segments=6, merge_factor=5)
    for i in range(11, 15):
        indexer.process_batch(corpus_df.filter(f"doc_id % 15 = {i}"), i)
    assert indexer.maybe_merge(spark, max_segments=6, merge_factor=5)
    manifest = indexer._load_manifest()
    merge_keys = [k for k in manifest if k.startswith("seg_m")]
    assert len(merge_keys) == 2 and len(set(merge_keys)) == 2
    s = indexer.refresh(spark)
    full = IndexSearcher(build_index(corpus_df))
    assert s.index.max_doc == full.index.max_doc  # was 30/45 before the fix
    assert s.index.doclens.count() == full.index.doclens.count()
    assert _topk(s) == _topk(full)
