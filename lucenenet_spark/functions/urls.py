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
