"""robots.txt rule evaluation over a URL table (RFC 9309 semantics).

A crawl pipeline's politeness layer: given per-host (path_prefix,
allow) rule groups parsed from robots.txt, decide each URL by the
LONGEST matching prefix, with ALLOW winning length ties (RFC 9309 §2.2.2
"most specific match; least restrictive on tie"), and default-allow when
no rule matches.

Spark shape (what survives 10^12 URLs x 10^8 hosts):
- Rules join URLs on host FIRST (equi-join; the rules side is tiny per
  host — real robots files average tens of rules — so at scale this is
  a broadcast join), then the prefix test is a pushdown-friendly
  ``startswith`` filter inside the joined rows.
- The winner per URL is one row_number window over (prefix length DESC,
  allow DESC), partitioned by URL — bounded by the handful of matching
  rules, never by the corpus.
- Unmatched URLs re-enter via left join + coalesce(default allow).

The deterministic rule/URL generators below give the gate a synthetic
crawl: host = the documents table's ``source`` column, and each doc_id
maps to a path exercising every branch (deep-allow overriding a
disallow, bare disallow, and the no-rule default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synth_rules(docs: DataFrame) -> DataFrame:
    """Deterministic per-host rule set over the corpus's source hosts:
    every host disallows /private; hosts ending in an even digit allow
    the more specific /private/ok back (the RFC longest-match case);
    hosts ending in a digit divisible by 3 also disallow /tmp."""
    hosts = docs.select(F.col("source").alias("host")).distinct()
    last = F.substring(F.col("host"), -1, 1).cast("int")
    r1 = hosts.select("host", F.lit("/private").alias("path_prefix"), F.lit(False).alias("allow"))
    r2 = hosts.filter(last % 2 == 0).select(
        "host", F.lit("/private/ok").alias("path_prefix"), F.lit(True).alias("allow")
    )
    r3 = hosts.filter(last % 3 == 0).select(
        "host", F.lit("/tmp").alias("path_prefix"), F.lit(False).alias("allow")
    )
    return r1.unionByName(r2).unionByName(r3)


def synth_urls(docs: DataFrame) -> DataFrame:
    """One URL per doc: path branch chosen by doc_id % 4 —
    0: /private/ok/page<id> (allow-override branch on even hosts),
    1: /private/page<id>    (disallowed),
    2: /tmp/page<id>        (disallowed on %3 hosts, default elsewhere),
    3: /public/page<id>     (no rule, default allow)."""
    branch = F.col("doc_id") % 4
    path = (
        F.when(branch == 0, F.concat(F.lit("/private/ok/page"), F.col("doc_id")))
        .when(branch == 1, F.concat(F.lit("/private/page"), F.col("doc_id")))
        .when(branch == 2, F.concat(F.lit("/tmp/page"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("/public/page"), F.col("doc_id")))
    )
    return docs.select(
        "doc_id", F.col("source").alias("host"), path.alias("path")
    )


def robots_filter(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """(doc_id, host, path, allowed, matched_prefix): RFC 9309 decision
    per URL. matched_prefix is '' for the no-rule default-allow case."""
    from pyspark.sql import Window

    m = (
        urls.join(rules, "host")
        .filter(F.col("path").startswith(F.col("path_prefix")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.length("path_prefix")), F.desc("allow")
    )
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("allow").alias("m_allow"), F.col("path_prefix").alias("m_prefix"))
    )
    return (
        urls.join(best, "doc_id", "left")
        .select(
            "doc_id",
            "host",
            "path",
            F.coalesce(F.col("m_allow"), F.lit(True)).alias("allowed"),
            F.coalesce(F.col("m_prefix"), F.lit("")).alias("matched_prefix"),
        )
    )


def synth_redirects(docs: DataFrame) -> DataFrame:
    """Deterministic redirect map over doc ids: every doc with
    doc_id % 5 == 0 redirects to (doc_id + floor(n/3)) % n. Because the
    target can itself be % 5 == 0, multi-hop chains (and, on small
    moduli, cycles) occur naturally — exactly what the resolver must
    bound."""
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    return (
        docs.select(F.col("doc_id").cast("long").alias("src"))
        .filter(F.col("src") % 5 == 0)
        .crossJoin(F.broadcast(n_df))
        .select(
            "src",
            ((F.col("src") + F.floor(F.col("_n") / 3)) % F.col("_n")).alias("target"),
        )
    )


def resolve_redirects(urls: DataFrame, redirects: DataFrame, max_hops: int = 3) -> DataFrame:
    """(doc_id, final_id, hops, terminal): follow the redirect map up to
    ``max_hops``; terminal=false marks ids still redirecting after the
    budget (the crawler's redirect-loop guard; HTTP clients cap hops the
    same way).

    Scale shape: ``max_hops`` broadcast-joins against the redirect map —
    the map is the SMALL side on a real crawl (a few % of URLs redirect),
    so each hop is one broadcast hash join; no iteration state beyond the
    running column pair. Unrolled statically like the PageRank oracle.
    """
    out = urls.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("long").alias("cur"),
        F.lit(0).cast("long").alias("hops"),
    )
    for _ in range(max_hops):
        out = (
            out.join(
                redirects.select(F.col("src").alias("cur"), "target"), "cur", "left"
            )
            .select(
                "doc_id",
                F.coalesce(F.col("target"), F.col("cur")).alias("cur"),
                (F.col("hops") + F.when(F.col("target").isNotNull(), 1).otherwise(0)).alias("hops"),
            )
        )
    final = (
        out.join(redirects.select(F.col("src").alias("cur"), F.lit(1).alias("still")), "cur", "left")
        .select(
            "doc_id",
            F.col("cur").alias("final_id"),
            F.col("hops").cast("long").alias("hops"),
            F.col("still").isNull().alias("terminal"),
        )
    )
    return final
