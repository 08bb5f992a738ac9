"""Round-5e tests: Queries-module filters (BoostingQuery, ChainedFilter,
BooleanFilter), Flexible/MultiField parser front-ends, PKIndexSplitter."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.queries import (
    BooleanQuery,
    Occur,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def engine(spark, corpus_df):
    idx = build_index(corpus_df, text_col="text", id_col="doc_id").cache()
    return idx, IndexSearcher(idx, mode="double")


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


# ---------------------------------------------------------------------------
# expand_multi_fields tree walk (driver-side, no Spark)
# ---------------------------------------------------------------------------
def test_expand_multi_fields_leaf_fanout():
    from lucenenet_spark.queryparser.flexible import expand_multi_fields

    q = expand_multi_fields(TermQuery("quick"), ["title", "body"], {"title": 2.0})
    assert isinstance(q, BooleanQuery)
    assert len(q.clauses) == 2
    fields = {c.query.field: c.query for c in q.clauses}
    assert set(fields) == {"title", "body"}
    assert fields["title"].boost == 2.0
    assert fields["body"].boost == 1.0
    assert all(c.occur is Occur.SHOULD for c in q.clauses)


def test_expand_multi_fields_explicit_field_untouched():
    from lucenenet_spark.queryparser.flexible import expand_multi_fields

    bound = TermQuery("quick", field="url")
    q = expand_multi_fields(bound, ["title", "body"])
    assert q == bound  # MultiFieldQueryNodeProcessor only rewrites default-field nodes


def test_expand_multi_fields_single_field_no_wrapper():
    from lucenenet_spark.queryparser.flexible import expand_multi_fields

    q = expand_multi_fields(TermQuery("quick"), ["body"])
    assert isinstance(q, TermQuery)
    assert q.field == "body"


def test_expand_multi_fields_recurses_boolean():
    from lucenenet_spark.queryparser.flexible import expand_multi_fields

    src = BooleanQuery.of(
        (TermQuery("quick"), Occur.MUST), (TermQuery("fox", field="url"), Occur.MUST)
    )
    q = expand_multi_fields(src, ["a", "b"])
    first, second = q.clauses
    assert isinstance(first.query, BooleanQuery)  # fanned out
    assert second.query.field == "url"  # untouched


# ---------------------------------------------------------------------------
# StandardQueryParser config surface
# ---------------------------------------------------------------------------
def test_standard_parser_leading_wildcard_gate():
    from lucenenet_spark.queryparser.flexible import StandardQueryParser

    p = StandardQueryParser()
    # (a word-initial '*' is the MatchAll token in the classic grammar
    # subset, so the leading-wildcard config is exercised with '?')
    with pytest.raises(ValueError, match="leading wildcard"):
        p.parse("?uick")
    p.set_allow_leading_wildcard(True)
    q = p.parse("?uick")
    assert isinstance(q, WildcardQuery)


def test_standard_parser_default_field_binds():
    from lucenenet_spark.queryparser.flexible import StandardQueryParser

    q = StandardQueryParser().parse("quick", default_field="body")
    assert q.field == "body"


def test_standard_parser_operator_validation():
    from lucenenet_spark.queryparser.flexible import StandardQueryParser

    p = StandardQueryParser()
    with pytest.raises(ValueError):
        p.set_default_operator("XOR")


# ---------------------------------------------------------------------------
# MultiFieldQueryParser static variants
# ---------------------------------------------------------------------------
def test_multifield_parse_per_field():
    from lucenenet_spark.queryparser.flexible import MultiFieldQueryParser

    q = MultiFieldQueryParser.parse_per_field(["quick", "fox"], ["title", "body"])
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    assert all(c.occur is Occur.SHOULD for c in q.clauses)
    with pytest.raises(ValueError):
        MultiFieldQueryParser.parse_per_field(["quick"], ["title", "body"])


def test_multifield_parse_with_flags():
    from lucenenet_spark.queryparser.flexible import MultiFieldQueryParser

    q = MultiFieldQueryParser.parse_with_flags(
        "quick", ["title", "body"], [Occur.MUST, Occur.MUST_NOT]
    )
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST_NOT]


# ---------------------------------------------------------------------------
# BoostingQuery
# ---------------------------------------------------------------------------
def test_boosting_identity_when_boost_one(engine):
    from lucenenet_spark.search.boosting import boosting_scored

    _, s = engine
    base = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("quick")).collect()}
    boosted = {
        r["doc_id"]: r["score"]
        for r in boosting_scored(s, TermQuery("quick"), TermQuery("fox"), 1.0).collect()
    }
    assert base == boosted


def test_boosting_demotes_only_context_matches(engine):
    from lucenenet_spark.search.boosting import boosting_scored

    _, s = engine
    base = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("quick")).collect()}
    ctx = _ids(s.docset(TermQuery("w0002")))
    out = {
        r["doc_id"]: r["score"]
        for r in boosting_scored(
            s, TermQuery("quick"), TermQuery("w0002"), 0.5
        ).collect()
    }
    assert set(out) == set(base)  # context never adds or removes hits
    assert ctx & set(base), "fixture must overlap"
    for d, sc in out.items():
        expect = base[d] * 0.5 if d in ctx else base[d]
        assert sc == pytest.approx(expect, rel=1e-12)


# ---------------------------------------------------------------------------
# ChainedFilter / BooleanFilter
# ---------------------------------------------------------------------------
def test_chained_filter_uniform_or_is_union(engine):
    from lucenenet_spark.search.filters import OR, chained_filter

    _, s = engine
    a, b = TermQuery("quick"), TermQuery("fox")
    got = _ids(chained_filter(s, [a, b], logic=OR))
    assert got == _ids(s.docset(a)) | _ids(s.docset(b))


def test_chained_filter_initial_andnot_is_complement(engine):
    from lucenenet_spark.search.filters import ANDNOT, chained_filter

    idx, s = engine
    a = TermQuery("quick")
    got = _ids(chained_filter(s, [a], logic=[ANDNOT]))
    universe = _ids(idx.doclens.select("doc_id"))
    assert got == universe - _ids(s.docset(a))


def test_chained_filter_mixed_logic(engine):
    from lucenenet_spark.search.filters import AND, ANDNOT, XOR, chained_filter

    _, s = engine
    a, b, c = TermQuery("quick"), TermQuery("w0003"), TermQuery("w0001")
    sa, sb, sc = _ids(s.docset(a)), _ids(s.docset(b)), _ids(s.docset(c))
    got = _ids(chained_filter(s, [a, b, c], logic=[AND, ANDNOT, XOR]))
    assert got == (sa - sb) ^ sc


def test_chained_filter_logic_length_mismatch(engine):
    from lucenenet_spark.search.filters import AND, chained_filter

    _, s = engine
    with pytest.raises(ValueError, match="logic"):
        chained_filter(s, [TermQuery("quick")], logic=[AND, AND])


def test_boolean_filter_algebra(engine):
    from lucenenet_spark.search.filters import boolean_filter

    _, s = engine
    sh1, sh2, nt = PrefixQuery("qu"), TermQuery("w0002"), TermQuery("fox")
    got = _ids(
        boolean_filter(
            s, [(sh1, Occur.SHOULD), (sh2, Occur.SHOULD), (nt, Occur.MUST_NOT)]
        )
    )
    expect = (_ids(s.docset(sh1)) | _ids(s.docset(sh2))) - _ids(s.docset(nt))
    assert got == expect


def test_boolean_filter_not_only_starts_from_all_docs(engine):
    from lucenenet_spark.search.filters import boolean_filter

    idx, s = engine
    nt = TermQuery("quick")
    got = _ids(boolean_filter(s, [(nt, Occur.MUST_NOT)]))
    universe = _ids(idx.doclens.select("doc_id"))
    assert got == universe - _ids(s.docset(nt))


# ---------------------------------------------------------------------------
# PKIndexSplitter
# ---------------------------------------------------------------------------
def test_pk_split_partitions_universe(engine):
    from lucenenet_spark.index.splitter import pk_split_index

    idx, _ = engine
    passing, failing = pk_split_index(idx, (F.col("doc_id") % 3) == 0)
    p = _ids(passing.doclens)
    f = _ids(failing.doclens)
    assert p & f == set()
    assert p | f == _ids(idx.doclens)
    assert all(d % 3 == 0 for d in p)


def test_pk_split_stats_are_local(engine):
    from lucenenet_spark.index.splitter import pk_split_index

    idx, _ = engine
    passing, _ = pk_split_index(idx, (F.col("doc_id") % 3) == 0)
    # df of 'quick' on the passing side == passing docs containing it
    s = IndexSearcher(passing, mode="double")
    hits = s.docset(TermQuery("quick")).count()
    df_row = (
        passing.term_stats.filter(F.col("term") == "quick").select("df").collect()
    )
    df_val = int(df_row[0]["df"]) if df_row else 0
    assert df_val == hits


# ---------------------------------------------------------------------------
# Line-level boilerplate dedup
# ---------------------------------------------------------------------------
def test_strip_duplicate_lines_removes_boilerplate(spark):
    from lucenenet_spark.functions.linededup import (
        duplicated_lines,
        strip_duplicate_lines,
    )

    docs = spark.createDataFrame(
        [
            (0, "cookie banner\nunique zero\nfooter text"),
            (1, "cookie banner\nunique one\nfooter text"),
            (2, "cookie banner\nunique two"),
            (3, "only unique content here"),
        ],
        "doc_id long, text string",
    )
    boiler = {r["line_df"] for r in duplicated_lines(docs).collect()}
    assert boiler == {3, 2}  # cookie banner in 3 docs, footer in 2

    out = {r["doc_id"]: r for r in strip_duplicate_lines(docs).collect()}
    assert out[0]["text"] == "unique zero"
    assert out[1]["text"] == "unique one"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "only unique content here"
    assert out[0]["lines_dropped"] == 2 and out[2]["lines_dropped"] == 1


def test_strip_duplicate_lines_all_boilerplate_doc_survives_empty(spark):
    from lucenenet_spark.functions.linededup import strip_duplicate_lines

    docs = spark.createDataFrame(
        [(0, "same line"), (1, "same line"), (2, "same line\nextra")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_duplicate_lines(docs).collect()}
    assert out[0]["text"] == "" and out[0]["lines_kept"] == 0
    assert out[2]["text"] == "extra"


def test_strip_duplicate_lines_in_doc_repeat_not_cross_doc(spark):
    from lucenenet_spark.functions.linededup import strip_duplicate_lines

    # a line repeated INSIDE one doc only is not boilerplate (distinct
    # per doc before the df count)
    docs = spark.createDataFrame(
        [(0, "echo\necho\necho"), (1, "other")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in strip_duplicate_lines(docs).collect()}
    assert out[0]["text"] == "echo\necho\necho"
    assert out[0]["lines_dropped"] == 0


# ---------------------------------------------------------------------------
# Per-host cap
# ---------------------------------------------------------------------------
def _host_pages(spark):
    rows = []
    for i in range(30):
        host = ["a.com", "www.a.com", "b.org"][i % 3]
        rows.append((i, f"https://{host}/p/{i}", float(i)))
    return spark.createDataFrame(rows, "doc_id long, url string, warc_ts double")


def test_cap_per_host_folds_www_and_keeps_earliest(spark):
    from lucenenet_spark.functions.urls import cap_per_host

    out = cap_per_host(_host_pages(spark), 3).collect()
    by_host = {}
    for r in out:
        key = "a" if "a.com" in r["url"] else "b"
        by_host.setdefault(key, []).append(r["doc_id"])
    # a.com and www.a.com fold together: 20 pages -> 3 earliest
    assert sorted(by_host["a"]) == [0, 1, 3]
    assert sorted(by_host["b"]) == [2, 5, 8]


def test_cap_per_host_skewed_matches_plain(spark):
    from lucenenet_spark.functions.urls import cap_per_host, cap_per_host_skewed

    pages = _host_pages(spark)
    a = {r["doc_id"] for r in cap_per_host(pages, 3).collect()}
    b = {r["doc_id"] for r in cap_per_host_skewed(pages, 3).collect()}
    assert a == b
    # under-cap host bypasses: cap 15 keeps all of b.org (10 pages)
    c = {r["doc_id"] for r in cap_per_host_skewed(pages, 15).collect()}
    assert {r["doc_id"] for r in pages.collect() if "b.org" in r["url"]} <= c


def test_host_col_strips_userinfo_port_www(spark):
    from lucenenet_spark.functions.urls import host_col

    df = spark.createDataFrame(
        [
            ("https://user:pw@www.Ex.COM:8443/x",),
            ("http://plain.net/y",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(host_col(F.col("url"))).collect()]
    assert got == ["ex.com", "plain.net"]


# ---------------------------------------------------------------------------
# DocumentDictionary / FileDictionary
# ---------------------------------------------------------------------------
def test_document_dictionary_weights_and_skips(spark):
    from lucenenet_spark.search.suggest import document_dictionary

    docs = spark.createDataFrame(
        [(0, "alpha beta", 7), (1, None, 3), (2, "", 9), (3, "gamma", None)],
        "doc_id long, title string, clicks long",
    )
    out = {
        r["surface"]: r["weight"]
        for r in document_dictionary(docs, "title", "clicks").collect()
    }
    assert out == {"alpha beta": 7, "gamma": 0}  # null weight -> 0, null/empty surface skipped
    flat = document_dictionary(docs, "title").collect()
    assert all(r["weight"] == 1 for r in flat)


def test_file_dictionary_parses_weights_and_payloads(spark, tmp_path):
    from lucenenet_spark.search.suggest import file_dictionary

    p = tmp_path / "dict.tsv"
    p.write_text("hello\t42\tPAY\nworld\nbroken\tnotanumber\n")
    rows = {r["surface"]: r for r in file_dictionary(spark, str(p)).collect()}
    assert rows["hello"]["weight"] == 42 and rows["hello"]["payload"] == "PAY"
    assert rows["world"]["weight"] == 1 and rows["world"]["payload"] is None
    assert rows["broken"]["weight"] == 1  # unparsable weight -> default
