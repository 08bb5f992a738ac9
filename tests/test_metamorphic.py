"""Distributed-invariance tests — the cluster-size-independence analogue of
QueryUtils.CheckSkipTo (reference TestFramework/Search/QueryUtils.cs:125-127):
identical term_stats, doclens, and top-k regardless of input partitioning.

This is the local proxy for the north rule's N vs 4N executor requirement:
results must be a pure function of the data, never of the physical layout.
"""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.index.builder import assign_doc_ids
from lucenenet_spark.search.queries import BooleanQuery, Occur


def _index_fingerprint(idx, searcher):
    stats = sorted(
        (r["term"], r["df"], r["ttf"]) for r in idx.term_stats.collect()
    )
    doclens = sorted((r["doc_id"], r["dl"], r["norm_byte"]) for r in idx.doclens.collect())
    q = BooleanQuery.of((TermQuery("w0000"), Occur.SHOULD), (TermQuery("w0001"), Occur.SHOULD))
    topk = [(r["doc_id"], r["score"]) for r in searcher.search(q, 10).collect()]
    return stats, doclens, topk


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_partitioning_invariance(spark, corpus_df, parts):
    base_idx = build_index(corpus_df)
    base = _index_fingerprint(base_idx, IndexSearcher(base_idx))

    repart = corpus_df.repartition(parts)
    idx = build_index(repart)
    got = _index_fingerprint(idx, IndexSearcher(idx))
    assert got == base


def test_doc_id_assignment_is_partition_invariant(spark, corpus_df):
    df = corpus_df.drop("doc_id")
    a = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(df, "url", num_partitions=2).select("url", "doc_id").collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(df.repartition(13), "url", num_partitions=7)
        .select("url", "doc_id")
        .collect()
    }
    assert a == b
    # dense 0..N-1, rank of url
    urls = sorted(a)
    assert [a[u] for u in urls] == list(range(len(urls)))
