"""LineDoc + TREC content sources (lucenenet_spark/sources/linedoc.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from lucenenet_spark.sources import read_linedoc, read_trec, write_linedoc


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[2]")
        .appName("test-sources")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_linedoc_roundtrip_default_fields(spark, tmpd):
    df = spark.createDataFrame(
        [("t1", "20260101", "body one"), ("t2", "20260102", "body\ttwo\nlines")],
        "title string, date string, body string",
    )
    p = os.path.join(tmpd, "docs.line")
    write_linedoc(df, p)
    back = {r.title: (r.date, r.body) for r in read_linedoc(spark, p).collect()}
    assert back["t1"] == ("20260101", "body one")
    # embedded tab/newline sanitized to spaces (WriteLineDocTask behavior)
    assert back["t2"] == ("20260102", "body two lines")


def test_linedoc_custom_fields_header(spark, tmpd):
    df = spark.createDataFrame(
        [("a", "x one"), ("b", "x two")], "docid string, contents string"
    )
    p = os.path.join(tmpd, "custom.line")
    write_linedoc(df, p, fields=("docid", "contents"))
    out = read_linedoc(spark, p)
    assert out.columns == ["docid", "contents"]
    assert {r.docid: r.contents for r in out.collect()} == {"a": "x one", "b": "x two"}


def test_trec_blocks(spark, tmpd):
    content = (
        "<DOC>\n<DOCNO> FBIS-1 </DOCNO>\n<TEXT>\nfirst body text\n</TEXT>\n</DOC>\n"
        "<DOC>\n<DOCNO>FBIS-2</DOCNO>\n<TEXT>second body</TEXT>\n</DOC>\n"
    )
    p = os.path.join(tmpd, "trec")
    os.makedirs(p)
    with open(os.path.join(p, "f1.txt"), "w") as f:
        f.write(content)
    got = {r.docno: r.text for r in read_trec(spark, p).collect()}
    assert got == {"FBIS-1": "first body text", "FBIS-2": "second body"}


def test_linedoc_feeds_index(spark, tmpd):
    """Source -> build_index -> search end-to-end."""
    from lucenenet_spark import IndexSearcher, TermQuery, build_index
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(str(i), "20260101", f"common word{i}") for i in range(20)],
        "title string, date string, body string",
    )
    p = os.path.join(tmpd, "corpus.line")
    write_linedoc(df, p)
    docs = read_linedoc(spark, p).select(
        F.col("title").cast("long").alias("doc_id"), F.col("body").alias("text")
    )
    s = IndexSearcher(build_index(docs))
    assert s.count(TermQuery("common")) == 20
    assert s.count(TermQuery("word7")) == 1


def test_enwiki_pages(spark, tmpd):
    from lucenenet_spark.sources import read_enwiki

    xml = (
        "<mediawiki><page>\n<title>Alpha Page</title>\n<id>1</id>\n"
        "<revision><text xml:space=\"preserve\">body of alpha</text></revision>\n</page>\n"
        "<page><title>Beta</title><revision><text>beta body</text></revision></page>\n"
        "</mediawiki>"
    )
    p = os.path.join(tmpd, "wiki")
    os.makedirs(p)
    with open(os.path.join(p, "dump.xml"), "w") as f:
        f.write(xml)
    got = {r.title: r.text for r in read_enwiki(spark, p).collect()}
    assert got == {"Alpha Page": "body of alpha", "Beta": "beta body"}


def test_reuters_one_doc_per_file(spark, tmpd):
    from lucenenet_spark.sources import read_reuters

    p = os.path.join(tmpd, "reuters")
    os.makedirs(p)
    with open(os.path.join(p, "art1.txt"), "w") as f:
        f.write("26-FEB-1987 15:01:01.79\n\nBAHIA COCOA REVIEW\n\nShowers continued\nthroughout the week\n")
    with open(os.path.join(p, "art2.txt"), "w") as f:
        f.write("27-FEB-1987 09:00:00.00\n\nSECOND TITLE\n\nsingle line body\n")
    got = {r.title: (r.date, r.text) for r in read_reuters(spark, p).collect()}
    assert got["BAHIA COCOA REVIEW"] == (
        "26-FEB-1987 15:01:01.79", "Showers continued throughout the week"
    )
    assert got["SECOND TITLE"] == ("27-FEB-1987 09:00:00.00", "single line body")


def test_geonames_parser(spark, tmpd):
    from lucenenet_spark.sources import read_geonames

    p = os.path.join(tmpd, "geo")
    os.makedirs(p)
    with open(os.path.join(p, "allCountries.txt"), "w") as f:
        f.write("3578267\tMorne du Vitet\tMorne du Vitet\t\t17.88333\t-62.8\tT\n")
        f.write("42\tTest Place\tTest\talt\t-1.5\t103.25\tP\n")
    rows = {r.geonameid: r for r in read_geonames(spark, p).collect()}
    assert rows[3578267].name == "Morne du Vitet"
    assert abs(rows[3578267].lat - 17.88333) < 1e-9
    assert abs(rows[3578267].lon - (-62.8)) < 1e-9
    # WKT body is lon-lat (x y) order, as GeonamesLineParser writes it
    assert rows[42].body == "POINT(103.25 -1.5)"
