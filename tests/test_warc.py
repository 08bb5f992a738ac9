"""WET content source: Content-Length-exact parsing invariants."""

import os
import tempfile

from pyspark.sql import functions as F

from lucenenet_spark.sources.warc import _parse_wet_bytes, read_wet, write_wet


def _roundtrip(spark, rows):
    df = spark.createDataFrame(rows, "uri string, text string")
    path = os.path.join(tempfile.mkdtemp(prefix="wet_test_"), "c.wet")
    write_wet(df, path)
    back = read_wet(spark, path)
    return {r.uri: r.text for r in back.collect()}


def test_wet_roundtrip_basic(spark):
    rows = [("http://a/1", "hello world"), ("http://a/2", "second doc")]
    assert _roundtrip(spark, rows) == dict(rows)


def test_wet_content_with_blank_lines_and_fake_headers(spark):
    # Content-Length parsing must NOT split on blank lines or be fooled
    # by header-like text inside the record body
    tricky = "para one\r\n\r\npara two\r\nWARC/1.0\r\nContent-Length: 999"
    rows = [("http://t/1", tricky), ("http://t/2", "after")]
    got = _roundtrip(spark, rows)
    assert got["http://t/1"] == tricky
    assert got["http://t/2"] == "after"


def test_wet_multibyte_content_length(spark):
    # Content-Length is BYTES: multi-byte UTF-8 must round-trip
    rows = [("http://u/1", "naïve café — 日本語テキスト"), ("http://u/2", "x")]
    assert _roundtrip(spark, rows) == dict(rows)


def test_wet_parser_skips_non_conversion_and_bad_records():
    raw = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://k\r\n"
        b"Content-Length: 5\r\n\r\nhello\r\n\r\n"
        b"WARC/1.0\r\nContent-Length: nonsense\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://z\r\n"
        b"Content-Length: 2\r\n\r\nzz\r\n\r\n"
    )
    got = list(_parse_wet_bytes(raw))
    assert [(u, t) for u, _, t in got] == [("http://k", "hello"), ("http://z", "zz")]


def test_wet_records_end_with_crlf_crlf(spark):
    df = spark.createDataFrame([("http://a/1", "body")], "uri string, text string")
    path = os.path.join(tempfile.mkdtemp(prefix="wet_test_"), "c.wet")
    write_wet(df, path)
    blob = b""
    for f in sorted(os.listdir(path)):
        if f.startswith("part-"):
            blob += open(os.path.join(path, f), "rb").read()
    assert b"body\r\n\r\n" in blob  # spec record terminator on disk


def test_wet_file_parallelism(spark):
    # records written across partitions land in separate WET members
    df = spark.createDataFrame(
        [(f"http://p/{i}", f"text {i}") for i in range(8)],
        "uri string, text string",
    ).repartition(4)
    path = os.path.join(tempfile.mkdtemp(prefix="wet_test_"), "c.wet")
    write_wet(df, path)
    members = [f for f in os.listdir(path) if f.startswith("part-")]
    assert len(members) == 4
    back = read_wet(spark, path)
    assert back.count() == 8
    assert back.agg(F.count_distinct("uri")).collect()[0][0] == 8


def test_wet_negative_content_length_terminates():
    # corrupt record with negative length must not loop forever
    raw = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://bad\r\n"
        b"Content-Length: -95\r\n\r\nxx\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://ok\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    got = list(_parse_wet_bytes(raw))
    assert [(u, t) for u, _, t in got] == [("http://ok", "ok")]


def test_wet_header_injection_sanitized(spark):
    # CR/LF in a URI must not terminate the header block early
    rows = [("http://a/1\r\n\r\nWARC-Date: evil", "payload"), ("http://a/2", "x")]
    df = spark.createDataFrame(rows, "uri string, text string")
    path = os.path.join(tempfile.mkdtemp(prefix="wet_test_"), "c.wet")
    write_wet(df, path)
    got = {r.uri: r.text for r in read_wet(spark, path).collect()}
    assert got == {"http://a/1WARC-Date: evil": "payload", "http://a/2": "x"}
