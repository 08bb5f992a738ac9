"""Round-5n tests: temperature mixture weights and sequence packing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.packing import pack_sequences
from lucenenet_spark.functions.sampling import temperature_weights

ROWS = [
    # (doc_id, text, lang) — lang counts: en 4, de 2, th 1
    (0, "a b c", "en"),
    (1, "d e f g h", "en"),
    (2, "i", "en"),
    (3, "j k", "en"),
    (4, "l m n o", "de"),
    (5, "p q r", "de"),
    (6, "s t u v w x", "th"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text", "lang"])


# ------------------------------------------------------------ temperature
def test_temperature_alpha_one_is_proportional(docs):
    out = {r.lang: r for r in temperature_weights(docs, "lang", alpha=1.0).collect()}
    for r in out.values():
        assert r.repeat_factor == pytest.approx(1.0)
    assert out["en"].p == pytest.approx(4 / 7)


def test_temperature_alpha_zero_is_uniform(docs):
    out = {r.lang: r.p for r in temperature_weights(docs, "lang", alpha=0.0).collect()}
    assert all(p == pytest.approx(1 / 3) for p in out.values())


def test_temperature_half_brute_force(docs):
    out = {r.lang: r for r in temperature_weights(docs, "lang", alpha=0.5).collect()}
    z = math.sqrt(4) + math.sqrt(2) + math.sqrt(1)
    assert out["th"].p == pytest.approx(1 / z)
    # tail upsampled, head downsampled
    assert out["th"].repeat_factor > 1.0 > out["en"].repeat_factor


def test_temperature_rejects_bad_alpha(docs):
    with pytest.raises(ValueError):
        temperature_weights(docs, "lang", alpha=1.5)


# ------------------------------------------------------------ packing
def _brute_pack(rows, capacity, n_shards):
    out = {}
    streams = {}
    for doc_id, text, _lang in sorted(rows):
        n = len(text.split(" "))
        if n == 0:
            continue
        shard = doc_id % n_shards
        off = streams.get(shard, 0)
        streams[shard] = off + n
        first, last = off // capacity, (off + n - 1) // capacity
        out[doc_id] = (shard, n, off, first, last, last - first + 1)
    return out


def test_pack_sequences_brute_force(docs):
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.offset, r.chunk_first, r.chunk_last, r.chunks_spanned)
        for r in pack_sequences(docs, capacity=4, n_shards=2).collect()
    }
    assert got == _brute_pack(ROWS, 4, 2)


def test_pack_sequences_partitioning_invariance(docs):
    a = sorted(map(tuple, pack_sequences(docs, capacity=4, n_shards=2).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(5), capacity=4, n_shards=2).collect())
    )
    assert a == b


def test_pack_sequences_chunk_laws(spark, docs):
    out = pack_sequences(docs, capacity=3, n_shards=1).collect()
    # stream is contiguous: offsets sorted by doc_id tile the token stream
    rows = sorted(out, key=lambda r: r.doc_id)
    expect = 0
    for r in rows:
        assert r.offset == expect
        expect += r.n_tokens
        assert r.chunks_spanned == r.chunk_last - r.chunk_first + 1
        assert r.chunk_first == r.offset // 3


def test_pack_sequences_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, capacity=4, n_shards=0)


# ------------------------------------------------------------ c4
def test_c4_clean_stats_rules(spark):
    from lucenenet_spark.functions.c4 import c4_clean_filter, c4_clean_stats

    rows = [
        # 3 kept lines (>=5 words, terminal punct) -> kept
        (0, "one two three four five.\nsix seven eight nine ten!\na b c d e f?"),
        # lines too short or unterminated -> dropped
        (1, "short line.\nno punctuation here at all\nalso short!"),
        # enough sentences but lorem ipsum -> dropped
        (2, "one two three four five.\nsix seven eight nine ten.\na b c d lorem ipsum."),
        # curly brace -> dropped
        (3, "one two three four five.\nsix seven eight nine ten.\na b c d e.{"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in c4_clean_stats(docs).collect()}
    assert got[0].kept and got[0].n_kept_lines == 3 and got[0].n_sentences == 3
    assert not got[1].kept and got[1].n_kept_lines == 0
    assert not got[2].kept and got[2].n_sentences >= 3  # page-level kill
    assert not got[3].kept
    kept_ids = {r.doc_id for r in c4_clean_filter(docs).collect()}
    assert kept_ids == {0}


def test_c4_line_rule_boundaries(spark):
    from lucenenet_spark.functions.c4 import c4_clean_stats

    docs = spark.createDataFrame(
        [(0, "one two three four five.\none two three four.")], ["doc_id", "text"]
    )
    r = c4_clean_stats(docs).collect()[0]
    # exactly-5-words line kept, 4-word line dropped
    assert r.n_lines == 2 and r.n_kept_lines == 1


# ------------------------------------------------------------ collation range
def test_collated_term_range_bounds(spark):
    from lucenenet_spark.analysis.collation import collated_term_range

    rows = [(i, w) for i, w in enumerate(["Äpfel", "Bach", "Österreich", "oel", "zebra", "aepfel"])]
    df = spark.createDataFrame(rows, ["doc_id", "title"])
    got = {r.title for r in collated_term_range(df, "title", "Äpfel", "Österreich").collect()}
    # lo inclusive (both spellings of aepfel), hi exclusive, oel < oesterreich
    assert got == {"Äpfel", "aepfel", "Bach", "oel"}
    open_hi = {r.title for r in collated_term_range(df, "title", "Bach", None).collect()}
    assert open_hi == {"Bach", "Österreich", "oel", "zebra"}
    incl = {r.title for r in collated_term_range(
        df, "title", "Äpfel", "Österreich", include_hi=True).collect()}
    assert incl == {"Äpfel", "aepfel", "Bach", "oel", "Österreich"}


# ------------------------------------------------------------ field value
def test_field_value_filter_positive_and_negate(spark):
    from lucenenet_spark.search.filters import field_value_filter

    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, "b"), (3, None)], "doc_id long, v string"
    )
    assert {r.doc_id for r in field_value_filter(df, "v").collect()} == {0, 2}
    assert {r.doc_id for r in field_value_filter(df, "v", negate=True).collect()} == {1, 3}


# ------------------------------------------------------------ det shuffle
def test_deterministic_shuffle_stable_and_permutes(spark):
    from lucenenet_spark.functions.sampling import deterministic_shuffle

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = [r.doc_id for r in deterministic_shuffle(df).collect()]
    b = [r.doc_id for r in deterministic_shuffle(df.repartition(7)).collect()]
    assert a == b  # partitioning-invariant
    assert sorted(a) == list(range(100))  # a permutation
    assert a != list(range(100))  # actually shuffled
    c = [r.doc_id for r in deterministic_shuffle(df, salt="epoch2").collect()]
    assert c != a  # new salt, new order


# ------------------------------------------------------------ geo cell join
def _brute_geo_pairs(left, right, radius_km):
    import math

    R = 6371.0088
    out = set()
    for lid, llat, llon in left:
        for rid, rlat, rlon in right:
            dlat = math.radians(rlat - llat) / 2
            dlon = math.radians(rlon - llon) / 2
            a = math.sin(dlat) ** 2 + math.cos(math.radians(llat)) * math.cos(
                math.radians(rlat)
            ) * math.sin(dlon) ** 2
            if 2 * R * math.asin(math.sqrt(a)) <= radius_km:
                out.add((lid, rid))
    return out


def test_geo_cell_join_adversarial_latitudes(spark):
    from lucenenet_spark.search.spatial import geo_cell_join

    # clusters at high latitude, near the dateline, and near a pole —
    # the cases a fixed 3x3 neighborhood silently misses
    pts = [
        (0, 75.0, 10.0), (1, 75.1, 21.0),          # high-lat: wide lon gap, ~280 km
        (2, 0.0, 179.9), (3, 0.1, -179.9),         # dateline wrap, ~25 km
        (4, 89.5, 0.0), (5, 89.5, 180.0),          # both near pole, ~111 km
        (6, -40.0, 5.0), (7, -40.0, 8.0),          # mid-lat ~256 km
        (8, 10.0, 100.0),                          # isolated
    ]
    df = spark.createDataFrame(pts, ["doc_id", "lat", "lon"])
    got = {
        (r.left_id, r.right_id)
        for r in geo_cell_join(df, df, 300.0).collect()
    }
    assert got == _brute_geo_pairs(pts, pts, 300.0)


def test_geo_cell_join_no_cartesian_in_plan(spark):
    from lucenenet_spark.search.spatial import geo_cell_join

    df = spark.range(20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3.7 % 180 - 90).alias("lat"),
        (F.col("id") * 11.3 % 360 - 180).alias("lon"),
    )
    plan = geo_cell_join(df, df, 200.0)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


# ------------------------------------------------------------ distinct values
def test_group_distinct_values_brute(spark):
    from lucenenet_spark.search.collectors import group_distinct_values

    rows = [(0, "g1", "en"), (1, "g1", "de"), (2, "g1", "en"), (3, "g2", "th")]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "lang"])
    got = {r.grp: (r.n_distinct, r.values) for r in group_distinct_values(df, "grp", "lang").collect()}
    assert got == {"g1": (2, "de,en"), "g2": (1, "th")}


# ------------------------------------------------------------ lifetime
def test_searcher_lifetime_record_acquire(spark, tmp_path):
    from lucenenet_spark.index.builder import build_index  # noqa: F401 (warm imports)
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.streaming.incremental import IncrementalIndexer

    docs = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 == 0 else "alpha gamma") for i in range(20)],
        ["doc_id", "text"],
    )
    ix = IncrementalIndexer(str(tmp_path / "idx"))
    ix.process_batch(docs.filter(F.col("doc_id") < 10), 0)
    token = ix.record()
    ix.process_batch(docs.filter(F.col("doc_id") >= 10), 1)

    pinned = ix.acquire(spark, token)
    live = ix.refresh(spark)
    assert {r.doc_id for r in pinned.docset(TermQuery("alpha")).collect()} == set(range(10))
    assert {r.doc_id for r in live.docset(TermQuery("alpha")).collect()} == set(range(20))
    # pinned stats are as-of the record point: df(alpha) = 10 not 20
    n_pinned = pinned.index.max_doc
    assert n_pinned == 10 and live.index.max_doc == 20


def test_searcher_lifetime_pruned_token_raises(spark, tmp_path):
    from lucenenet_spark.streaming.incremental import IncrementalIndexer

    docs = spark.createDataFrame([(0, "a b"), (1, "c d")], ["doc_id", "text"])
    ix = IncrementalIndexer(str(tmp_path / "idx2"))
    ix.process_batch(docs, 0)
    with pytest.raises(KeyError):
        ix.acquire(spark, ("seg_does_not_exist",))


# ------------------------------------------------------------ contexts
def test_infix_suggester_contexts(spark):
    from lucenenet_spark.search.suggest import AnalyzingInfixSuggester

    ent = spark.createDataFrame(
        [("key value", 10), ("scan key", 7), ("key order", 3)], ["surface", "weight"]
    )
    ctx = spark.createDataFrame(
        [("key value", "en"), ("scan key", "de"), ("key order", "de")],
        ["surface", "context"],
    )
    sug = AnalyzingInfixSuggester(ent, contexts_df=ctx)
    no_ctx = [r.surface for r in sug.lookup("key", 5).collect()]
    assert no_ctx == ["key value", "scan key", "key order"]
    de = [r.surface for r in sug.lookup("key", 5, contexts={"de"}).collect()]
    assert de == ["scan key", "key order"]
    both = [r.surface for r in sug.lookup("key", 5, contexts={"de", "en"}).collect()]
    assert both == no_ctx  # disjunction over contexts


def test_infix_suggester_contexts_requires_table(spark):
    from lucenenet_spark.search.suggest import AnalyzingInfixSuggester

    ent = spark.createDataFrame([("key value", 1)], ["surface", "weight"])
    with pytest.raises(ValueError):
        AnalyzingInfixSuggester(ent).lookup("key", 5, contexts={"en"})
