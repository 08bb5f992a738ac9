"""URL canonicalization + canonical-URL deduplication.

The standard web-pipeline normalization pass over the input_hint's
``url`` column (beyond the reference's scope; part of this engine's
LLM-pipeline family): collapse the URL variants that alias the same
resource, then keep one page per canonical URL.

Canonical form (all JVM-side column expressions — regexp_replace /
lower / substring; no Python in the hot path, and the regex subset
avoids lookaround so the same patterns run identically under Java
regex (Spark) and RE2 (DuckDB oracles)):

1. strip the fragment (``#...``)
2. lowercase scheme + host (path/query case is preserved — it is
   significant on most servers)
3. drop default ports (``:80`` for http, ``:443`` for https)
4. strip a ``www.`` host prefix
5. collapse duplicate slashes in the path-and-after part (which never
   contains the scheme's ``://``)
6. strip a single trailing slash (root included:
   ``https://a.com/`` == ``https://a.com``)

Dedup keeps the row with the smallest ``warc_ts`` (first crawl wins)
per canonical URL — min-by aggregation, one shuffle on the canonical
key; ties broken by doc id for determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url_col(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")  # fragment first
    # scheme+host[:port] = everything up to the first '/' or '?' after '://'
    scheme_host = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?]*)", 1)
    rest = F.substring(u, F.length(scheme_host) + 1, F.lit(2_000_000_000))
    norm_sh = F.lower(scheme_host)
    norm_sh = F.regexp_replace(norm_sh, r"^(http://[^/:?]*):80$", r"$1")
    norm_sh = F.regexp_replace(norm_sh, r"^(https://[^/:?]*):443$", r"$1")
    norm_sh = F.regexp_replace(norm_sh, r"^(https?://)www\.", r"$1")
    rest = F.regexp_replace(rest, r"/{2,}", "/")  # rest never holds '://'
    rest = F.regexp_replace(rest, r"^(.*?)/$", r"$1")
    return F.concat(norm_sh, rest)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn("canonical_url", canonical_url_col(F.col(url_col)))


def dedup_by_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per canonical URL: earliest ``ts_col`` wins, ``id_col``
    tie-break. min(struct(ts, id)) per key — a single map-side-combined
    aggregation, no window sort."""
    keyed = with_canonical_url(df, url_col=url_col)
    best = keyed.groupBy("canonical_url").agg(
        F.min(F.struct(ts_col, id_col)).alias("_best")
    ).select("canonical_url", F.col(f"_best.{id_col}").alias(id_col))
    return keyed.join(best, ["canonical_url", id_col], "left_semi")


def canonical_url_sql_expr(col: str = "url") -> str:
    """The identical canonicalization as a DuckDB expression (oracle
    construction helper). Mirrors canonical_url_col step for step."""
    u = f"regexp_replace({col}, '#.*$', '')"
    sh = f"regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?]*)', 1)"
    rest = f"substring({u}, length({sh}) + 1)"
    nsh = f"lower({sh})"
    nsh = f"regexp_replace({nsh}, '^(http://[^/:?]*):80$', '\\1')"
    nsh = f"regexp_replace({nsh}, '^(https://[^/:?]*):443$', '\\1')"
    nsh = f"regexp_replace({nsh}, '^(https?://)www\\.', '\\1')"
    nrest = f"regexp_replace(regexp_replace({rest}, '/{{2,}}', '/', 'g'), '^(.*?)/$', '\\1')"
    return f"({nsh} || {nrest})"


def host_col(url: Column) -> Column:
    """Registrable-host key: lowercase authority without scheme, port,
    userinfo or a leading www. — the per-domain key C4/RefinedWeb-class
    pipelines cap on."""
    h = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1))
    h = F.regexp_replace(h, r"^.*@", "")  # userinfo
    h = F.regexp_replace(h, r":\d+$", "")  # port
    return F.regexp_replace(h, r"^www\.", "")


def host_sql_expr(col: str = "url") -> str:
    """host_col as a DuckDB expression (oracle helper), step for step."""
    h = f"lower(regexp_extract({col}, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1))"
    h = f"regexp_replace({h}, '^.*@', '')"
    h = f"regexp_replace({h}, ':[0-9]+$', '')"
    return f"regexp_replace({h}, '^www\\.', '')"


def cap_per_host(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_per_host`` pages per host, earliest
    (ts, id) first — the per-domain cap web pipelines apply so mega-hosts
    don't dominate the training mix (C4 keeps limited pages per domain;
    RefinedWeb caps URL share per registrable domain).

    Scale shape: ONE hash shuffle on the host key and a streaming
    row_number inside each partition — no sort of the full corpus, no
    collect. A host with 10^9 pages makes one hot reducer; for corpora
    with such hosts, pre-aggregate per-host counts (map-side combined)
    and route only over-cap hosts through the window — the under-cap
    long tail (virtually all hosts) bypasses the shuffle entirely, which
    is the plan `cap_per_host_skewed` builds."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(host_col(F.col(url_col)))
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn")
    )


def cap_per_host_skewed(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """cap_per_host with the skew guard: hosts whose total page count is
    already <= cap skip the window shuffle (left_anti against the
    over-cap host list, unioned with the windowed survivors of over-cap
    hosts only). Same result set as cap_per_host; the window input
    shrinks from the whole corpus to the over-cap hosts' rows."""
    keyed = df.withColumn("_host", host_col(F.col(url_col)))
    over = (
        keyed.groupBy("_host")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_per_host)
        .select("_host")
    )
    under_rows = keyed.join(over, "_host", "left_anti").drop("_host")
    from pyspark.sql import Window

    w = Window.partitionBy("_host").orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    capped_rows = (
        keyed.join(over, "_host", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn", "_host")
    )
    return under_rows.unionByName(capped_rows)


def registrable_domain_col(host: Column, suffixes: list[str]) -> Column:
    """eTLD+1 (registrable domain) extraction against a public-suffix
    list (publicsuffix.org semantics): the LONGEST matching suffix wins
    ('sub.x.co.uk' matches 'co.uk', not 'uk'), and the registrable
    domain is the one label left of it.  Hosts matching no listed
    suffix fall back to the PSL '*' default (last label is the suffix,
    so the registrable domain is the last two labels); a host that IS a
    suffix has no registrable domain (NULL).

    This is the grouping key crawl politeness, host capping, and
    site-level dedup actually want — 'a.example.co.uk' and
    'b.example.co.uk' are the same site, 'example.co.uk' and
    'sample.co.uk' are not, which naive last-two-label grouping gets
    wrong for every ccTLD.

    All JVM-side: one CASE chain over literal suffixes (the PSL is a
    few thousand entries — a broadcastable literal table or generated
    expression, never a shuffle).
    """
    import re as _re

    expr = F.when(
        host.rlike(r"^[^.]+\.[^.]+"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(F.lit(None).cast("string"))
    # longest suffix first so the generated CASE respects PSL precedence
    for s in sorted(suffixes, key=lambda x: (x.count("."), len(x))):
        esc = _re.escape(s)
        label = F.regexp_extract(host, r"([^.]+)\." + esc + r"$", 1)
        expr = F.when(host == F.lit(s), F.lit(None).cast("string")).otherwise(expr)
        expr = F.when(
            host.rlike(r"\." + esc + r"$"),
            F.concat(label, F.lit("." + s)),
        ).otherwise(expr)
    return expr
