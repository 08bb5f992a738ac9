"""Round-3b operators: MemoryIndex percolation, PostingsHighlighter,
ComplexPhrase + Surround parsers."""

import pytest

from lucenenet_spark import build_index
from lucenenet_spark.queryparser.complex_phrase import (
    complex_phrase_docs,
    parse_complex_phrase,
)
from lucenenet_spark.queryparser.surround import parse_surround, surround_docs
from lucenenet_spark.search.memory import MemoryIndex, percolate
from lucenenet_spark.search.postings_highlight import highlight_postings
from lucenenet_spark.search.queries import (
    BooleanQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


@pytest.fixture(scope="module")
def idx(spark):
    rows = [
        (0, "fast merge key value fast merge"),
        (1, "slow scan table merge big key"),
        (2, "key fast value merge"),
        (3, "the a fast key"),
    ]
    return build_index(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).cache()


# ------------------------------------------------------------- MemoryIndex
def test_memory_index_matches():
    mi = MemoryIndex("fast merge key value")
    assert mi.matches(TermQuery("merge"))
    assert not mi.matches(TermQuery("scan"))
    assert mi.matches(PhraseQuery(terms=("fast", "merge")))
    assert not mi.matches(PhraseQuery(terms=("merge", "fast")))
    assert mi.matches(PhraseQuery(terms=("merge", "fast"), slop=2))
    assert mi.matches(PrefixQuery(prefix="val"))
    assert mi.matches(
        BooleanQuery.of((TermQuery("fast"), Occur.MUST), (TermQuery("dup"), Occur.MUST_NOT))
    )
    # stopword positions leave holes: "the a" consume positions 0,1
    mi2 = MemoryIndex("the a fast key")
    assert mi2.matches(PhraseQuery(terms=("fast", "key")))


def test_percolate(spark):
    docs = spark.createDataFrame(
        [(0, "fast merge key"), (1, "slow scan"), (2, "key agg row")],
        "doc_id long, text string",
    )
    reg = {
        "has_merge": TermQuery("merge"),
        "key_agg": PhraseQuery(terms=("key", "agg")),
    }
    got = {(r["doc_id"], r["query_id"]) for r in percolate(docs, reg).collect()}
    assert got == {(0, "has_merge"), (2, "key_agg")}


# ------------------------------------------------------------- highlighter
def test_postings_highlight_picks_densest_window(spark):
    docs = spark.createDataFrame(
        [(0, "x x x x x x x x vector vector vector y y y y y"),
         (1, "no match here at all")],
        "doc_id long, text string",
    )
    out = highlight_postings(docs, ["vector"], window=8).collect()
    assert len(out) == 1  # non-matching doc dropped
    r = out[0]
    assert r["doc_id"] == 0
    assert "<b>vector</b>" in r["snippet"]
    # window 2 (tokens 8..15) holds all three matches
    assert r["snippet"].startswith("<b>vector</b> <b>vector</b> <b>vector</b>")
    # pstart = chars of 8 leading "x " tokens
    assert r["pstart"] == 16


def test_postings_highlight_position_norm_prefers_early(spark):
    # same window content at different offsets -> norm(start) favors start
    docs = spark.createDataFrame(
        [(0, "vector a b c d e f g " * 4)], "doc_id long, text string"
    )
    out = highlight_postings(docs, ["vector"], window=8).collect()
    assert out[0]["pstart"] == 0


def test_postings_highlight_sentence_mode(spark):
    docs = spark.createDataFrame(
        [(0, "first sentence here. the vector sentence wins. a trailer.")],
        "doc_id long, text string",
    )
    out = highlight_postings(docs, ["vector"], break_mode="sentence").collect()
    assert out[0]["snippet"] == "the <b>vector</b> sentence wins."


# ------------------------------------------------------------- parsers
def test_complex_phrase_parse():
    slots, slop = parse_complex_phrase('"(john jon) smyth*"~2')
    assert slop == 2
    assert isinstance(slots[0], list) and len(slots[0]) == 2
    assert isinstance(slots[1], PrefixQuery)


def test_complex_phrase_docs(idx):
    # "fa* merge" exact adjacency: docs 0 (twice), 2 has "value merge" no;
    # doc 2 is "key fast value merge" -> fast@1, merge@3 not adjacent
    got = {r["doc_id"] for r in complex_phrase_docs(idx, '"fa* merge"').collect()}
    assert got == {0}
    # alternatives + slop -> unordered
    got2 = {r["doc_id"] for r in complex_phrase_docs(idx, '"(scan table) big"~2').collect()}
    assert got2 == {1}


def test_surround_parse_and_eval(idx):
    node = parse_surround("and(3w(fast, key), not(dup))")
    assert node[1] == "and"
    # 3w(fast, key): ordered within distance 3 (slop 2):
    # doc 2: fast@1 key@0 -> wrong order; doc 3: fast@2 key@3 adjacent ok
    # doc 0: fast@0 key@2 ok
    got = {r["doc_id"] for r in surround_docs(idx, "3w(fast, key)").collect()}
    assert got == {0, 3}
    # unordered picks up doc 2 as well
    got2 = {r["doc_id"] for r in surround_docs(idx, "3n(fast, key)").collect()}
    assert got2 == {0, 2, 3}
    # boolean algebra + wildcard leaf
    got3 = {r["doc_id"] for r in surround_docs(idx, "and(or(sc*, big), merge)").collect()}
    assert got3 == {1}
    got4 = {r["doc_id"] for r in surround_docs(idx, "not(fast, table)").collect()}
    assert got4 == {0, 2, 3}
