"""WARC/WET content source (ISO 28500 / WARC 1.0 "conversion" records —
the Common Crawl WET plain-text distribution format).

The reference ships benchmark content sources for TREC/enwiki/Reuters
(`Lucene.Net.Benchmark/ByTask/Feeds/*ContentSource.cs`); a web-scale
corpus engine additionally needs the format the actual web crawl ships
in. This module writes and reads WET conversion records:

    WARC/1.0
    WARC-Type: conversion
    WARC-Target-URI: <uri>
    WARC-Date: <iso8601>
    Content-Type: text/plain
    Content-Length: <n-bytes>
    <CRLF>
    <n bytes of UTF-8 plain text>
    <CRLF><CRLF>

Scale design: the reader parallelizes at FILE granularity — exactly how
Common Crawl WET processing distributes (one ~1 GB WET member per
task). ``binaryFile`` hands each file's bytes to one task; parsing is
Content-Length-driven (never split-on-separator, so record text may
contain blank lines or literal header-like lines), Arrow-batched via
mapInPandas. Gzip members are out of scope in-sandbox (no codec dep);
point the reader at uncompressed .wet files or pre-decompressed dirs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = "\r\n"


def write_wet(
    df: DataFrame,
    path: str,
    uri_col: str = "uri",
    text_col: str = "text",
    date_col: str | None = None,
    default_date: str = "2026-01-01T00:00:00Z",
) -> None:
    """Write (uri, text[, date]) rows as WET conversion records. One
    record per row; Content-Length is the UTF-8 byte length of the
    text. Executor-parallel (ordinary Spark text write, one WET member
    per partition — records end with CRLF CRLF as in the spec)."""
    date = F.col(date_col) if date_col else F.lit(default_date)
    # CR/LF in header VALUES would terminate the header block early and
    # mis-frame the record (header-injection): strip them. Record TEXT
    # needs no escaping — it is Content-Length-framed.
    uri = F.regexp_replace(F.col(uri_col), "[\r\n]", "")
    date = F.regexp_replace(date.cast("string"), "[\r\n]", "")
    rec = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(F.col(text_col)).cast("string"), F.lit(_CRLF),
        F.lit(_CRLF),
        F.col(text_col),
        # the text writer appends \n: emit CRLF CR so the stored bytes
        # end each record with exactly CRLF CRLF
        F.lit(_CRLF + "\r"),
    )
    df.select(rec.alias("value")).write.mode("overwrite").text(path)


def _parse_wet_bytes(data: bytes):
    """Yield (uri, date, text) from one WET member. Content-Length
    drives the scan — header-like bytes inside record text are data."""
    i, n = 0, len(data)
    while True:
        start = data.find(b"WARC/", i)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("utf-8", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        if length < 0:  # corrupt record: a negative length would walk
            i = hdr_end + 4  # the cursor backwards and loop forever
            continue
        body_start = hdr_end + 4
        body = data[body_start : min(body_start + length, n)]
        if headers.get("warc-type", "conversion") == "conversion":
            yield (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                body.decode("utf-8", "replace"),
            )
        i = body_start + length


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET members under ``path`` into (uri, date, text). One task
    per file (the Common Crawl distribution unit); Content-Length-exact
    parsing so record text round-trips byte-for-byte."""
    # no glob filter: empty markers like _SUCCESS contain no "WARC/"
    # magic and parse to zero records
    files = spark.read.format("binaryFile").load(path).select("content")

    def parse(batches):
        for pdf in batches:
            uris, dates, texts = [], [], []
            for content in pdf["content"]:
                for uri, date, text in _parse_wet_bytes(bytes(content)):
                    uris.append(uri)
                    dates.append(date)
                    texts.append(text)
            yield pd.DataFrame({"uri": uris, "date": dates, "text": texts})

    return files.mapInPandas(parse, "uri string, date string, text string")
