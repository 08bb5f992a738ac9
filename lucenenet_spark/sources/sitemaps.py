"""Sitemap protocol (sitemaps.org XML) generation, parsing, coverage.

The crawl-side companion to robots.py: a production crawl pipeline
discovers URLs from per-host sitemap XML files, and the index side
publishes them for its own corpus.  This module implements both
directions Spark-first:

* ``synth_sitemaps`` — render one <urlset> XML document per host from the
  corpus (deterministic: entries lexicographically sorted, lastmod derived
  from doc_id), the publish path.
* ``parse_sitemaps`` — extract (loc, lastmod) pairs back out of raw XML
  with regexp_extract_all — whole-stage codegen, no XML library, no
  per-row Python; the sitemap grammar needed here (loc/lastmod inside
  url elements) is regular, exactly like the WARC/linedoc sources.
* ``sitemap_coverage`` — join parsed locations against the corpus URL per
  host: listed vs matched counts plus the lastmod range — the crawl
  scheduler's freshness/coverage report.

Scale shape: one groupBy(host) to render (bounded by array_sort over a
host's entries — cap hosts upstream if a single host exceeds executor
memory), one explode + hash join to audit.  Parsing is a map-only pass
over whatever sitemap bytes a fetcher delivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_XML_HEADER = '<?xml version="1.0" encoding="UTF-8"?><urlset>'
_XML_FOOTER = "</urlset>"


def doc_url(doc_id=None, host=None) -> F.Column:
    """Canonical synthetic URL of a corpus doc: https://<host>/doc/<id>."""
    doc_id = F.col("doc_id") if doc_id is None else doc_id
    host = F.col("source") if host is None else host
    return F.concat(F.lit("https://"), host, F.lit("/doc/"), doc_id)


def doc_lastmod(doc_id=None) -> F.Column:
    """Deterministic lastmod date string for a doc: 2024-MM-DD spread by
    doc_id (12 months x 28 days)."""
    doc_id = F.col("doc_id") if doc_id is None else doc_id
    return F.concat(
        F.lit("2024-"),
        F.lpad((doc_id % 12 + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((doc_id % 28 + 1).cast("string"), 2, "0"),
    )


def synth_sitemaps(docs: DataFrame) -> DataFrame:
    """(host, xml): one sitemaps.org <urlset> per host, entries sorted."""
    entry = F.concat(
        F.lit("<url><loc>"),
        doc_url(),
        F.lit("</loc><lastmod>"),
        doc_lastmod(),
        F.lit("</lastmod></url>"),
    )
    return (
        docs.select(F.col("source").alias("host"), entry.alias("entry"))
        .groupBy("host")
        .agg(
            F.concat(
                F.lit(_XML_HEADER),
                F.concat_ws("", F.array_sort(F.collect_list("entry"))),
                F.lit(_XML_FOOTER),
            ).alias("xml")
        )
    )


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, loc, lastmod) per <url> entry, in document order.

    lastmod is '' when an entry omits it (it is optional in the
    protocol); loc is required and entries without one are not emitted.
    """
    urls = F.regexp_extract_all(F.col("xml"), F.lit(r"<url>(.*?)</url>"), 1)
    return (
        sitemaps.select("host", F.explode(urls).alias("u"))
        .select(
            "host",
            F.regexp_extract(F.col("u"), r"<loc>([^<]*)</loc>", 1).alias("loc"),
            F.regexp_extract(F.col("u"), r"<lastmod>([^<]*)</lastmod>", 1).alias(
                "lastmod"
            ),
        )
        .filter(F.col("loc") != "")
    )


def sitemap_coverage(parsed: DataFrame, docs: DataFrame) -> DataFrame:
    """Per-host audit of parsed sitemap entries against the corpus:
    (host, n_listed, n_matched, first_lastmod, last_lastmod)."""
    corpus = docs.select(
        F.col("source").alias("host"), doc_url().alias("url")
    )
    joined = parsed.join(
        corpus, (parsed["host"] == corpus["host"]) & (parsed["loc"] == corpus["url"]), "left"
    ).select(parsed["host"], parsed["loc"], parsed["lastmod"], corpus["url"].alias("hit"))
    return joined.groupBy("host").agg(
        F.count("*").cast("long").alias("n_listed"),
        F.count("hit").cast("long").alias("n_matched"),
        F.min("lastmod").alias("first_lastmod"),
        F.max("lastmod").alias("last_lastmod"),
    )
