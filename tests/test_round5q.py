"""Round-5q tests: DSIR importance resampling (Xie et al. NeurIPS 2023
shape) — weight direction, Gumbel determinism, model boundedness, and the
no-cartesian/broadcast plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.dsir import (
    dsir_gumbel_topk,
    dsir_log_weights,
    dsir_select,
    hashed_gram_counts,
)

# a tiny bilingual corpus: target-like docs share the "data engine" topic
# vocabulary; off-target docs use a disjoint vocabulary
_TARGETY = [
    (0, "data engine builds the index", "en"),
    (1, "engine scans the data index", "en"),
    (2, "index data engine merge scan", "en"),
]
_OFFTARGET = [
    (10, "zvq wxk yyt plo qrs mnb", "xx"),
    (11, "plo qrs zvq wxk mnb yyt", "xx"),
]
_MIXED = [(20, "data engine zvq wxk index", "mx")]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        _TARGETY + _OFFTARGET + _MIXED, ["doc_id", "text", "lang"]
    )


def _weights(corpus):
    target = corpus.filter(F.col("lang") == "en")
    rows = dsir_log_weights(corpus, target, n_buckets=1024).collect()
    return {r["doc_id"]: r["logw"] for r in rows}


def test_weights_rank_target_like_docs_above_off_target(corpus):
    w = _weights(corpus)
    assert set(w) == {0, 1, 2, 10, 11, 20}
    # every target-vocabulary doc outweighs every off-target doc, with the
    # mixed doc strictly between the two groups
    assert min(w[0], w[1], w[2]) > w[20] > max(w[10], w[11])


def test_gumbel_topk_is_deterministic_and_seed_sensitive(corpus):
    target = corpus.filter(F.col("lang") == "en")
    a = dsir_gumbel_topk(corpus, target, k=3, seed="s1", n_buckets=1024).collect()
    b = dsir_gumbel_topk(corpus, target, k=3, seed="s1", n_buckets=1024).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    c = dsir_gumbel_topk(corpus, target, k=3, seed="s2", n_buckets=1024).collect()
    # same weights, different perturbation keys
    assert {r["doc_id"]: r["logw_q"] for r in a}.keys() == {
        r["doc_id"]: r["logw_q"] for r in a
    }.keys()
    assert [r["gumbel_q"] for r in a] != [r["gumbel_q"] for r in c]


def test_select_returns_k_raw_documents(corpus):
    target = corpus.filter(F.col("lang") == "en")
    out = dsir_select(corpus, target, k=4, n_buckets=1024)
    assert out.columns == corpus.columns
    assert out.count() == 4


def test_feature_table_is_bounded_by_n_buckets(corpus):
    counts = hashed_gram_counts(corpus, n_buckets=16)
    distinct = counts.select("bucket").distinct().collect()
    assert len(distinct) <= 16
    assert all(0 <= r["bucket"] < 16 for r in distinct)


def test_unigram_only_mode_differs_from_bigram_mode(corpus):
    target = corpus.filter(F.col("lang") == "en")
    w_uni = {
        r["doc_id"]: r["logw"]
        for r in dsir_log_weights(
            corpus, target, n_buckets=1024, bigrams=False
        ).collect()
    }
    w_big = _weights(corpus)
    assert w_uni != w_big
    # the direction of the signal is mode-invariant
    assert min(w_uni[0], w_uni[1], w_uni[2]) > max(w_uni[10], w_uni[11])


def test_plan_has_no_cartesian_and_broadcasts_the_models(corpus):
    target = corpus.filter(F.col("lang") == "en")
    plan = dsir_log_weights(corpus, target, n_buckets=1024)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------ global sequence packing
from lucenenet_spark.functions.packing import (  # noqa: E402
    pack_stream_offsets,
    sequence_fill_stats,
)

_PACK_DOCS = [
    (0, "a b c d e"),        # 5 tokens, offset 0
    (1, "f g h"),            # 3 tokens, offset 5 — straddles budget=6
    (2, ""),                 # 0 tokens, offset 8
    (3, "i j k l m n o p"),  # 8 tokens, offset 8 — spans two boundaries
    (4, "q"),                # 1 token, offset 16
]


@pytest.fixture(scope="module")
def pack_corpus(spark):
    return spark.createDataFrame(_PACK_DOCS, ["doc_id", "text"])


def test_packing_offsets_and_sequence_spans(pack_corpus):
    rows = {
        r["doc_id"]: r.asDict()
        for r in pack_stream_offsets(pack_corpus, budget=6, num_partitions=2).collect()
    }
    assert rows[0] == dict(doc_id=0, n_tokens=5, offset=0, seq_first=0, seq_last=0)
    # doc 1 occupies tokens 5..7: straddles the 6-token boundary
    assert rows[1] == dict(doc_id=1, n_tokens=3, offset=5, seq_first=0, seq_last=1)
    # zero-token doc pins to the sequence at its offset
    assert rows[2] == dict(doc_id=2, n_tokens=0, offset=8, seq_first=1, seq_last=1)
    # doc 3 occupies tokens 8..15: sequences 1 and 2
    assert rows[3] == dict(doc_id=3, n_tokens=8, offset=8, seq_first=1, seq_last=2)
    assert rows[4] == dict(doc_id=4, n_tokens=1, offset=16, seq_first=2, seq_last=2)


def test_packing_is_partitioning_invariant(pack_corpus):
    key = lambda d: d["doc_id"]  # noqa: E731
    a = sorted(
        (r.asDict() for r in pack_stream_offsets(pack_corpus, budget=6, num_partitions=1).collect()),
        key=key,
    )
    b = sorted(
        (r.asDict() for r in pack_stream_offsets(pack_corpus, budget=6, num_partitions=5).collect()),
        key=key,
    )
    assert a == b


def test_fill_stats(pack_corpus):
    packed = pack_stream_offsets(pack_corpus, budget=6, num_partitions=2)
    row = sequence_fill_stats(packed, budget=6).collect()[0]
    # 17 tokens total -> 3 sequences, last one holds tokens 12..16 (5 full)
    assert row.asDict() == dict(n_sequences=3, total_tokens=17, last_fill=5)


def test_packing_rejects_bad_budget(pack_corpus):
    with pytest.raises(ValueError):
        pack_stream_offsets(pack_corpus, budget=0)


# ------------------------------------- block-join sorting permutation
from lucenenet_spark.index.sorter import block_join_permutation  # noqa: E402

# parents (doc_id, key, sortval); block sizes 2, 1, 3 children
_PARENTS = [(100, "a", 30.0), (200, "b", 10.0), (300, "c", 20.0)]
_CHILDREN = [
    (101, "a", 5), (102, "a", 3),
    (201, "b", 9),
    (301, "c", 1), (302, "c", 8), (303, "c", 2),
    (999, "zz", 7),  # orphan: parent absent -> dropped
]


@pytest.fixture(scope="module")
def block_perm(spark):
    parents = spark.createDataFrame(_PARENTS, ["doc_id", "key", "sortval"])
    children = spark.createDataFrame(_CHILDREN, ["doc_id", "key", "csort"])
    return parents, children


def test_blocks_order_by_parent_sort_children_first(block_perm):
    parents, children = block_perm
    out = block_join_permutation(
        parents, children, parent_key="key", parent_sort="sortval"
    ).collect()
    new = {r["old_id"]: r["new_id"] for r in out}
    # orphan dropped; ids dense over the 9 surviving docs
    assert 999 not in new and sorted(new.values()) == list(range(9))
    # block order: b (10.0) < c (20.0) < a (30.0); children before parent,
    # child_sort=None -> children keep old-id order inside the block
    order = [old for old, _ in sorted(new.items(), key=lambda kv: kv[1])]
    assert order == [201, 200, 301, 302, 303, 300, 101, 102, 100]
    flags = {r["old_id"]: r["is_parent"] for r in out}
    assert {o for o, f in flags.items() if f} == {100, 200, 300}


def test_child_sort_reorders_children_within_block_only(block_perm):
    parents, children = block_perm
    out = block_join_permutation(
        parents, children, parent_key="key", parent_sort="sortval",
        child_sort="csort",
    ).collect()
    new = {r["old_id"]: r["new_id"] for r in out}
    order = [old for old, _ in sorted(new.items(), key=lambda kv: kv[1])]
    # same block order, children now by csort: c-block 301(1),303(2),302(8)
    assert order == [201, 200, 301, 303, 302, 300, 102, 101, 100]


# ----------------------------------------------- curation pipeline
def test_curation_funnel_stages_each_bite(spark):
    from lucenenet_spark.functions.pipeline import curate

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "to find that other foxes have gathered with great joy near the old "
        "barn where the farmer keeps grain and the mice hide from the cats "
        "that prowl at night while owls watch from the tall trees above them"
    )
    rows = (
        # ids 0..9: distinct good docs (append a distinct stop-word tail so
        # content differs but stays rule-clean)
        [(i, good + " and the end of doc number " + "the " * i) for i in range(10)]
        # 10: exact duplicate of 0 -> dedup drops it (first-wins)
        + [(10, good + " and the end of doc number ")]
        # 11: fails gopher (too short)
        + [(11, "short doc with the and of that")]
        # 12: passes gopher but is all rare tokens -> LM tail
        + [(12, " ".join(f"uniq{i}tok" for i in range(60)) + " the of and the of and")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate(docs, sample_fraction=1.0, lm_min_avg_logprob=-4.5)
    ids = {r["doc_id"] for r in out.collect()}
    assert 10 not in ids  # dedup stage
    assert 11 not in ids  # gopher stage
    assert 12 not in ids  # LM stage (rare-token doc scores far below)
    assert ids <= set(range(10)) and len(ids) >= 8
    # the sample stage: fraction < 1 removes a deterministic subset
    sampled = curate(docs, sample_fraction=0.5, lm_min_avg_logprob=-4.5)
    assert sampled.count() < len(ids)
    again = curate(docs, sample_fraction=0.5, lm_min_avg_logprob=-4.5)
    assert sorted(map(tuple, sampled.collect())) == sorted(map(tuple, again.collect()))


def test_curate_job_cli_writes_survivors(spark, tmp_path):
    from jobs.curate_job import main as curate_main

    src = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    dest = str(tmp_path / "curated")
    curate_main(["--input", src, "--output", dest])
    out = spark.read.parquet(dest)
    assert 0 < out.count() < 500
    assert {"doc_id", "text", "n_tokens", "avg_logprob_q"} <= set(out.columns)


# ------------------------------------------- mixture materialization
from lucenenet_spark.functions.sampling import materialize_mixture  # noqa: E402


@pytest.fixture(scope="module")
def mixture_corpus(spark):
    rows = [(i, "big" if i < 240 else "small") for i in range(300)]
    return spark.createDataFrame(rows, ["doc_id", "grp"])


def test_alpha_one_keeps_every_doc_exactly_once(mixture_corpus):
    out = materialize_mixture(mixture_corpus, "grp", alpha=1.0).collect()
    assert len(out) == 300
    assert all(r["copy"] == 1 for r in out)


def test_tempering_upsamples_tail_and_downsamples_head(mixture_corpus):
    out = materialize_mixture(mixture_corpus, "grp", alpha=0.5)
    counts = {
        r["grp"]: (r["n_rows"], r["n_docs"])
        for r in out.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    big_rows, big_docs = counts["big"]
    small_rows, small_docs = counts["small"]
    # head group shrinks (r < 1: some docs dropped, none repeated);
    # tail group grows (r > 1: every doc kept, some repeated)
    assert big_rows < 240 and big_docs == big_rows
    assert small_rows > 60 and small_docs == 60
    # stochastic rounding keeps the realized total near the corpus size
    assert abs((big_rows + small_rows) - 300) < 30


def test_materialize_is_deterministic_and_salt_sensitive(mixture_corpus):
    a = sorted(map(tuple, materialize_mixture(mixture_corpus, "grp").collect()))
    b = sorted(map(tuple, materialize_mixture(mixture_corpus, "grp").collect()))
    assert a == b
    c = sorted(
        map(tuple, materialize_mixture(mixture_corpus, "grp", salt="epoch2").collect())
    )
    assert a != c


# --------------------------------------- Gopher + C4 quality rules
from lucenenet_spark.functions.quality_rules import (  # noqa: E402
    c4_clean_lines,
    c4_filter,
    gopher_quality_filter,
    gopher_quality_stats,
)

_GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs away "
    "to find that other foxes have gathered with great joy near the old "
    "barn where the farmer keeps grain and the mice hide from the cats "
    "that prowl at night while owls watch from the tall trees above them"
)  # >= 50 words, mean len in range, all alpha, plenty of stop hits


@pytest.fixture(scope="module")
def gopher_corpus(spark):
    rows = [
        (0, _GOOD),
        (1, "short doc with the and of that"),  # < 50 words
        (2, " ".join(["the", "of", "and"] + ["a"] * 60)),  # mean len < 3
        (3, " ".join(["the", "of"] + ["12345678"] * 60)),  # alpha frac < 0.8
        (4, " ".join(["zebra"] * 60)),  # no stop-list hits
        (5, _GOOD + " " + "### ### ### ### ### ### ### ### ### ###"),  # symbols
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_rules_each_reject_their_target(gopher_corpus):
    kept = {
        r["doc_id"] for r in gopher_quality_filter(gopher_corpus).collect()
    }
    assert kept == {0}


def test_gopher_stats_values(gopher_corpus):
    s = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_stats(gopher_corpus).collect()
    }
    assert s[4]["stop_hits"] == 0 and s[0]["stop_hits"] >= 2
    assert s[3]["alpha_frac_q"] < 8000 and s[0]["alpha_frac_q"] == 10000
    assert s[2]["mean_word_len_q"] < 30000
    assert s[5]["symbol_ratio_q"] > 1000 and s[0]["symbol_ratio_q"] == 0


def test_gopher_stats_plan_has_no_shuffle(gopher_corpus):
    plan = (
        gopher_quality_stats(gopher_corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


_C4_PAGE_A = (
    "this line has enough words and ends well.\n"
    "too short ends.\n"
    "this line has enough words but no terminal punctuation\n"
    "another qualifying line with plenty of words here.\n"
    "a third qualifying line with plenty of words too!"
)
_C4_PAGE_B = "only one qualifying line with enough words here.\nnope\nalso nope"


def test_c4_line_filter_keeps_and_rejects(spark):
    df = spark.createDataFrame(
        [(0, _C4_PAGE_A), (1, _C4_PAGE_B)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in c4_clean_lines(df).collect()}
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 3
    assert out[0]["page_kept"] is True
    assert out[0]["clean_text"].split("\n") == [
        "this line has enough words and ends well.",
        "another qualifying line with plenty of words here.",
        "a third qualifying line with plenty of words too!",
    ]
    assert out[1]["n_kept"] == 1 and out[1]["page_kept"] is False
    survivors = c4_filter(df)
    rows = survivors.collect()
    assert [r["doc_id"] for r in rows] == [0]
    assert rows[0]["text"] == out[0]["clean_text"]
    assert survivors.columns == df.columns


# --------------------------------------------------- IndexMergeTool
def test_merge_index_job_roundtrip_equals_single_build(spark, tmp_path):
    from jobs.merge_index_job import main as merge_main
    from lucenenet_spark.index.builder import InvertedIndex, build_index

    docs = spark.createDataFrame(
        [(i, f"spark merge doc{i} " + ("spark " * (i % 3))) for i in range(20)],
        ["doc_id", "text"],
    )
    lo = docs.filter(F.col("doc_id") < 10)
    hi = docs.filter(F.col("doc_id") >= 10).withColumn(
        "doc_id", F.col("doc_id") - F.lit(10)
    )
    a, b, dest = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    build_index(lo).save(a)
    build_index(hi).save(b)
    merge_main(["--output", dest, a, b])  # the lucene-cli `index merge` shape
    merged = InvertedIndex.load(spark, dest)
    single = build_index(docs)
    assert merged.max_doc == single.max_doc == 20
    m = {
        (r["field"], r["term"]): (r["df"], r["ttf"])
        for r in merged.term_stats.collect()
    }
    s = {
        (r["field"], r["term"]): (r["df"], r["ttf"])
        for r in single.term_stats.collect()
    }
    assert m == s


def test_blocks_stay_contiguous(block_perm):
    parents, children = block_perm
    out = block_join_permutation(
        parents, children, parent_key="key", parent_sort="sortval"
    ).collect()
    # group new ids by block (old id // 100 encodes the block here):
    # each block must occupy a contiguous new-id range ending at its parent
    by_block: dict[int, list[int]] = {}
    for r in out:
        by_block.setdefault(r["old_id"] // 100, []).append(r["new_id"])
    for ids in by_block.values():
        ids = sorted(ids)
        assert ids == list(range(ids[0], ids[0] + len(ids)))
