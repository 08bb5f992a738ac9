"""Round-5m tests: term vectors, JoinUtil score modes, LiveFieldValues
(point API + batch overlay), collation-key sort, ParallelAtomicReader,
CollectionStatistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.analysis.collation import collation_sort, german_phonebook_key
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.index.parallel import parallel_reader
from lucenenet_spark.search.joins import join_util_scored
from lucenenet_spark.search.misc import collection_statistics, term_vector
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.streaming.incremental import LiveFieldValues, live_overlay

DOCS = [
    (0, "spark query merge spark spark", "s0"),
    (1, "merge query the a table", "s0"),
    (2, "spark table scan", "s1"),
    (3, "query", "s1"),
    (4, "scan scan merge", "s2"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus).cache()


# ------------------------------------------------------------------ vectors
def test_term_vector_matches_brute_force(index):
    rows = {
        (r.term): (r.tf, r.first_pos)
        for r in term_vector(index).filter(F.col("doc_id") == 0).collect()
    }
    # analyzed doc 0: spark(0) query(1) merge(2) spark(3) spark(4)
    assert rows == {"spark": (3, 0), "query": (1, 1), "merge": (1, 2)}


def test_term_vector_doc_restriction_is_semi_join(index, spark):
    ids = spark.range(1).select(F.lit(4).alias("doc_id"))
    out = term_vector(index, doc_ids=ids).collect()
    assert {r.doc_id for r in out} == {4}
    assert {r.term: r.tf for r in out} == {"scan": 2, "merge": 1}


# ------------------------------------------------------------------ join
def test_join_util_scored_modes(spark, corpus):
    from_scored = spark.createDataFrame(
        [(0, 2.0), (1, 4.0), (2, 1.0)], ["doc_id", "score"]
    )
    attrs = corpus.select("doc_id", "source")
    got = {
        mode: {
            r.doc_id: r.score
            for r in join_util_scored(
                from_scored, attrs, attrs, join_col="source", score_mode=mode
            ).collect()
        }
        for mode in ("max", "total", "avg")
    }
    # s0 holds from-docs {0:2, 1:4}; s1 holds {2:1}; s2 matches nothing.
    assert got["max"] == {0: 4.0, 1: 4.0, 2: 1.0, 3: 1.0}
    assert got["total"] == {0: 6.0, 1: 6.0, 2: 1.0, 3: 1.0}
    assert got["avg"] == {0: 3.0, 1: 3.0, 2: 1.0, 3: 1.0}


def test_join_util_scored_rejects_bad_mode(spark, corpus):
    with pytest.raises(ValueError):
        join_util_scored(
            corpus.select("doc_id", F.lit(1.0).alias("score")),
            corpus.select("doc_id", "source"),
            corpus.select("doc_id", "source"),
            join_col="source",
            score_mode="none",
        )


# ------------------------------------------------------------------ live
def test_live_field_values_point_api():
    committed = {1: "a", 2: "b"}
    lfv = LiveFieldValues(lookup_fn=committed.get)
    assert lfv.get(1) == "a"
    lfv.add(1, "a2")
    lfv.add(3, "c")
    lfv.delete(2)
    assert lfv.get(1) == "a2"  # read-your-writes
    assert lfv.get(2) is None  # pending delete hides
    assert lfv.get(3) == "c"
    assert len(lfv) == 3
    lfv.refreshed()
    assert len(lfv) == 0
    assert lfv.get(1) == "a"  # falls through again


def test_live_overlay_batch_view(spark, corpus):
    committed = corpus.select("doc_id", F.col("source").alias("value"))
    pending = spark.createDataFrame(
        [(0, "w0", False), (2, None, True)], ["doc_id", "value", "deleted"]
    )
    got = {r.doc_id: r.value for r in live_overlay(committed, pending).collect()}
    assert got == {0: "w0", 1: "s0", 3: "s1", 4: "s2"}


def test_live_overlay_empty_pending_is_committed(spark, corpus):
    committed = corpus.select("doc_id", F.col("source").alias("value"))
    pending = spark.createDataFrame([], "doc_id long, value string, deleted boolean")
    assert sorted(live_overlay(committed, pending).collect()) == sorted(
        committed.collect()
    )


# ------------------------------------------------------------------ collation
def test_german_phonebook_primary_equality(spark):
    df = spark.createDataFrame(
        [("Müller",), ("mueller",), ("Straße",), ("strasse",), ("ÄPFEL",), ("aepfel",)],
        ["w"],
    )
    keys = [r.k for r in df.select(german_phonebook_key("w").alias("k")).collect()]
    assert keys[0] == keys[1] == "mueller"
    assert keys[2] == keys[3] == "strasse"
    assert keys[4] == keys[5] == "aepfel"


def test_collation_sort_order_law(spark):
    rows = [(i, w) for i, w in enumerate(["zebra", "Äpfel", "Bach", "Österreich", "oel"])]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = [r.title for r in collation_sort(df, "title").collect()]
    # DIN 5007-2: Äpfel(aepfel) < Bach < oel == Österreich(oesterreich)... oel < oesterreich
    assert got == ["Äpfel", "Bach", "oel", "Österreich", "zebra"]


# ------------------------------------------------------------------ parallel
def test_parallel_reader_matches_multifield_build(corpus):
    text_ix = build_index(corpus)
    src_ix = build_index(corpus, fields=["source"])
    par = parallel_reader(text_ix, src_ix)
    both = build_index(corpus, fields=["text", "source"])
    q = BooleanQuery.of(
        (TermQuery("merge"), Occur.MUST),
        (TermQuery("s0", field="source"), Occur.MUST),
    )
    a = {r.doc_id: round(r.score, 6) for r in IndexSearcher(par, mode="double").scored(q).collect()}
    b = {r.doc_id: round(r.score, 6) for r in IndexSearcher(both, mode="double").scored(q).collect()}
    assert a == b and a  # identical and non-empty


def test_parallel_reader_rejects_misaligned_and_duplicate(corpus, spark):
    text_ix = build_index(corpus)
    small = build_index(corpus.filter(F.col("doc_id") < 3), fields=["source"])
    with pytest.raises(ValueError, match="maxDoc"):
        parallel_reader(text_ix, small)
    with pytest.raises(ValueError, match="duplicate"):
        parallel_reader(text_ix, build_index(corpus))
    with pytest.raises(ValueError, match=">= 2"):
        parallel_reader(text_ix)


# ------------------------------------------------------------------ stats
def test_collection_statistics_brute_force(index):
    row = collection_statistics(index).collect()[0]
    # analyzed corpus: doc1 loses stopwords 'the a'
    toks = {
        0: ["spark", "query", "merge", "spark", "spark"],
        1: ["merge", "query", "table"],
        2: ["spark", "table", "scan"],
        3: ["query"],
        4: ["scan", "scan", "merge"],
    }
    assert row.field == "text"
    assert row.max_doc == 5
    assert row.doc_count == 5
    assert row.sum_ttf == sum(len(v) for v in toks.values())
    assert row.sum_df == sum(len(set(v)) for v in toks.values())


# ------------------------------------------------------------------ smartcn
def test_smartcn_segments_and_stems(spark):
    from lucenenet_spark.analysis.analyzers import SmartChineseAnalyzer

    an = SmartChineseAnalyzer(user_dict=["智能", "分词"])
    df = spark.createDataFrame(
        [(0, "merged queries 智能分词的系统"), (1, "running 未知词")],
        ["doc_id", "text"],
    )
    ix = build_index(df, analyzer=an)
    terms = {
        r.term
        for r in ix.postings.filter(F.col("doc_id") == 0).select("term").collect()
    }
    # Latin stemmed (merged->merg, queries->queri), dictionary words
    # segmented, 的 stop-dropped, unknown run 系统 bigrammed
    assert {"merg", "queri", "智能", "分词", "系统"} <= terms
    assert "的" not in terms
    terms1 = {
        r.term
        for r in ix.postings.filter(F.col("doc_id") == 1).select("term").collect()
    }
    # running -> run (Porter), 未知词 (no dict hit) -> overlapping bigrams
    assert terms1 == {"run", "未知", "知词"}


def test_smartcn_stop_leaves_position_hole(spark):
    from lucenenet_spark.analysis.analyzers import SmartChineseAnalyzer

    an = SmartChineseAnalyzer(user_dict=["智能", "分词"])
    df = spark.createDataFrame([(0, "智能的分词")], ["doc_id", "text"])
    ix = build_index(df, analyzer=an)
    rows = {r.term: r.positions for r in ix.postings.collect()}
    # 智能(0) 的(hole at 1) 分词(2)
    assert rows["智能"] == [0] and rows["分词"] == [2]


# ------------------------------------------------------------------ sources
def test_token_sources_highlight_fragment(index, corpus):
    from lucenenet_spark.search.highlight import token_sources_highlight

    out = {
        r.doc_id: (r.fragment, r.n_hits)
        for r in token_sources_highlight(index, corpus, "merge", context=1).collect()
    }
    # doc 0: 'spark query merge spark spark' -> window around pos 2
    assert out[0] == ("query <b>merge</b> spark", 1)
    # doc 4: 'scan scan merge' -> merge is last token, window clamps
    assert out[4] == ("scan <b>merge</b>", 1)
    # doc 1: merge at pos 0, window clamps left
    assert out[1] == ("<b>merge</b> query", 1)
    assert 2 not in out and 3 not in out


def test_token_sources_highlight_is_jvm_side(index, corpus):
    from lucenenet_spark.search.highlight import token_sources_highlight

    plan = token_sources_highlight(index, corpus, "merge")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
