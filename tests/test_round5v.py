"""Round-5 part-v twins: sharded top-k merge, static index pruning,
winnowing fingerprints, doc-id layout stats, sitemap roundtrip."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.docid_layout import docid_gap_stats
from lucenenet_spark.functions.winnowing import winnow_fingerprints, winnow_pairs
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.sharded import prune_index_topm, shard_merge_topk
from lucenenet_spark.sources.sitemaps import (
    parse_sitemaps,
    sitemap_coverage,
    synth_sitemaps,
)


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def corpus_index(spark):
    # 40 docs, overlapping vocab, tf variation so scores differ
    texts = [
        " ".join(
            ["alpha"] * (1 + i % 4)
            + ["beta"] * (1 + (i * 3) % 5)
            + [f"filler{i % 7} pad{i % 11} extra{i}"]
        )
        for i in range(40)
    ]
    docs = _mk_docs(spark, texts)
    return build_index(docs, text_col="text", id_col="doc_id").cache()


# ---------------------------------------------------------------- shard merge
@pytest.mark.parametrize("n_shards", [1, 3, 7])
def test_shard_merge_equals_single_searcher_page(corpus_index, n_shards):
    s = IndexSearcher(corpus_index, mode="double")
    q = BooleanQuery.of((TermQuery("alpha"), Occur.SHOULD), (TermQuery("beta"), Occur.SHOULD))
    merged = shard_merge_topk(s, q, n_shards=n_shards, k=8).collect()
    single = (
        s.scored(q)
        .select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(8)
        .collect()
    )
    assert [(r["doc_id"], r["score_q"]) for r in merged] == [
        (r["doc_id"], r["score_q"]) for r in single
    ]
    assert [r["rank"] for r in merged] == list(range(1, len(merged) + 1))


def test_shard_merge_shard_ids_are_contiguous_slices(corpus_index):
    s = IndexSearcher(corpus_index, mode="double")
    rows = shard_merge_topk(s, TermQuery("alpha"), n_shards=4, k=40).collect()
    span = -(-corpus_index.max_doc // 4)  # ceil
    for r in rows:
        assert r["shard_id"] == r["doc_id"] // span


# ---------------------------------------------------------------- pruning
def test_pruned_index_is_smaller_but_topk_identical(corpus_index):
    full = IndexSearcher(corpus_index, mode="double")
    pruned_idx = prune_index_topm(corpus_index, m=5)
    pruned = IndexSearcher(pruned_idx, mode="double")
    n_full = corpus_index.postings.filter(F.col("term") == "alpha").count()
    n_pruned = pruned_idx.postings.filter(F.col("term") == "alpha").count()
    assert n_full == 40 and n_pruned == 5
    top_full = full.search(TermQuery("alpha"), k=5).collect()
    top_pruned = pruned.search(TermQuery("alpha"), k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in top_full] == [
        (r["doc_id"], r["score"]) for r in top_pruned
    ]


def test_pruning_preserves_global_stats(corpus_index):
    pruned_idx = prune_index_topm(corpus_index, m=3)
    assert pruned_idx.max_doc == corpus_index.max_doc
    assert pruned_idx.sum_ttf == corpus_index.sum_ttf
    # survivors keep their exact full-index scores
    full = IndexSearcher(corpus_index, mode="double")
    pruned = IndexSearcher(pruned_idx, mode="double")
    f_scores = {r["doc_id"]: r["score"] for r in full.scored(TermQuery("beta")).collect()}
    for r in pruned.scored(TermQuery("beta")).collect():
        assert r["score"] == f_scores[r["doc_id"]]


def test_prune_rejects_bad_m(corpus_index):
    with pytest.raises(ValueError):
        prune_index_topm(corpus_index, m=0)


# ---------------------------------------------------------------- winnowing
def _py_winnow(text: str, k: int = 4, w: int = 5) -> set[int]:
    toks = [t for t in text.split(" ") if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    if not hs:
        return set()
    if len(hs) <= w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


def test_winnow_fingerprints_match_python_replica(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs right now please",
        "a b c",  # shorter than k -> no fingerprints
        "one two three four",  # exactly k tokens -> one gram, one window
    ]
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(_mk_docs(spark, texts)).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t), f"doc {i}"


def test_winnow_shared_substring_guarantee(spark):
    # docs sharing a >= w+k-1 = 8-token run MUST share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        "intro words here " + shared + " tail one",
        "totally different head " + shared,
        "no overlap with anyone at all whatsoever in this doc",
    ]
    fps = winnow_fingerprints(_mk_docs(spark, texts))
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in winnow_pairs(fps, min_shared=1).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_winnow_bucket_cap_drops_hot_fingerprints(spark):
    # 5 identical docs: every fp bucket has 5 docs; cap at 4 kills all pairs
    texts = ["same boilerplate footer text repeated verbatim here today"] * 5
    fps = winnow_fingerprints(_mk_docs(spark, texts))
    assert winnow_pairs(fps, min_shared=1, max_bucket_size=4).count() == 0
    assert winnow_pairs(fps, min_shared=1, max_bucket_size=5).count() == 10


# ---------------------------------------------------------------- docid layout
def test_docid_gap_stats_exact_bits_and_clustering_wins(spark):
    # two vocab clusters; url_order puts same-vocab docs adjacent
    texts = ["apple banana cherry"] * 4 + ["xray yankee zulu"] * 4
    idx = build_index(_mk_docs(spark, texts), text_col="text", id_col="doc_id")
    rows = {r["ordering"]: r for r in docid_gap_stats(idx).collect()}
    # url_order: every term's postings are consecutive ids -> all gaps 1,
    # 3 terms x 3 gaps x 2 clusters = 18 gaps of 1 bit
    assert rows["url_order"]["n_gaps"] == 18
    assert rows["url_order"]["total_bits"] == 18
    assert rows["url_order"]["milli_bits_per_gap"] == 1000
    assert rows["scrambled"]["n_gaps"] == 18
    assert rows["scrambled"]["total_bits"] >= rows["url_order"]["total_bits"]


# ---------------------------------------------------------------- sitemaps
def _mk_hosted_docs(spark, n=7):
    return spark.createDataFrame(
        [(i, f"text {i}", f"host{i % 2}.example") for i in range(n)],
        "doc_id long, text string, source string",
    )


def test_sitemap_roundtrip_exact(spark):
    docs = _mk_hosted_docs(spark)
    parsed = parse_sitemaps(synth_sitemaps(docs)).collect()
    expect = {
        (f"host{i % 2}.example", f"https://host{i % 2}.example/doc/{i}",
         f"2024-{i % 12 + 1:02d}-{i % 28 + 1:02d}")
        for i in range(7)
    }
    assert {(r["host"], r["loc"], r["lastmod"]) for r in parsed} == expect


def test_sitemap_parse_tolerates_missing_lastmod_and_requires_loc(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a/x</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://a/y</loc><lastmod>2024-02-02</lastmod></url>"
        "</urlset>"
    )
    rows = parse_sitemaps(
        spark.createDataFrame([("a", xml)], "host string, xml string")
    ).collect()
    assert {(r["loc"], r["lastmod"]) for r in rows} == {
        ("https://a/x", ""),
        ("https://a/y", "2024-02-02"),
    }


def test_sitemap_coverage_counts_and_range(spark):
    docs = _mk_hosted_docs(spark, n=6)
    cov = {
        r["host"]: r
        for r in sitemap_coverage(parse_sitemaps(synth_sitemaps(docs)), docs).collect()
    }
    for host, ids in (("host0.example", [0, 2, 4]), ("host1.example", [1, 3, 5])):
        r = cov[host]
        assert r["n_listed"] == 3 and r["n_matched"] == 3
        dates = [f"2024-{i % 12 + 1:02d}-{i % 28 + 1:02d}" for i in ids]
        assert r["first_lastmod"] == min(dates)
        assert r["last_lastmod"] == max(dates)
