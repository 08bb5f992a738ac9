"""LineDoc + TREC content sources.

LineDocSource (ByTask/Feeds/LineDocSource.cs + Tasks/WriteLineDocTask.cs):
one document per line, TAB-separated fields, default order
``title, date, body`` (WriteLineDocTask.DEFAULT_FIELDS). An optional
first line ``FIELDS_HEADER_INDICATOR###\\ttitle\\tdate\\t...`` declares a
custom field list. The writer replaces embedded tab/newline/carriage
returns with spaces, as the reference task does.

TrecContentSource (ByTask/Feeds/TrecContentSource.cs), documented subset:
``<DOC>`` blocks with ``<DOCNO>...</DOCNO>`` ids and ``<TEXT>...</TEXT>``
bodies (the common TREC disk format); date/parser plug-ins are out of
scope. Files are read whole (one file may hold many docs) and blocks are
extracted with native regexp functions — no per-row Python.

Everything is a plain DataFrame read/write: Spark's text source handles
splits/compression/partitioning; parsing is whole-stage-codegen column
expressions, so a terabyte of line docs scans like any other text table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\t"
FIELDS_HEADER_INDICATOR = "FIELDS_HEADER_INDICATOR###"
DEFAULT_FIELDS = ("title", "date", "body")


def write_linedoc(
    df: DataFrame, path: str, fields: tuple[str, ...] = DEFAULT_FIELDS
) -> None:
    """Write one tab-separated line per row (WriteLineDocTask). A header
    line is emitted only for non-default field lists, like the task."""
    spark = df.sparkSession
    clean = [
        F.regexp_replace(F.col(f).cast("string"), r"[\t\r\n]", " ").alias(f)
        for f in fields
    ]
    lines = df.select(F.concat_ws(SEP, *clean).alias("value"))
    if tuple(fields) != DEFAULT_FIELDS:
        header = spark.createDataFrame(
            [(FIELDS_HEADER_INDICATOR + SEP + SEP.join(fields),)], "value string"
        )
        lines = header.unionAll(lines)
    lines.coalesce(1).write.mode("overwrite").text(path)


def read_linedoc(spark: SparkSession, path: str) -> DataFrame:
    """Read a linedoc file/dir into a DataFrame with the declared (or
    default) field columns. Malformed lines (too few separators) yield
    empty trailing fields rather than erroring, matching the reference's
    lenient SimpleLineParser behavior for the last field."""
    raw = spark.read.text(path)
    first = raw.limit(1).collect()
    fields = DEFAULT_FIELDS
    if first and first[0]["value"].startswith(FIELDS_HEADER_INDICATOR + SEP):
        fields = tuple(first[0]["value"].split(SEP)[1:])
        raw = raw.filter(~F.col("value").startswith(FIELDS_HEADER_INDICATOR + SEP))
    parts = F.split(F.col("value"), SEP)
    cols = [F.element_at(parts, i + 1).alias(f) for i, f in enumerate(fields)]
    return raw.select(*cols)


def read_trec(spark: SparkSession, path: str) -> DataFrame:
    """Parse TREC-format files into (docno, text). Subset: <DOC> blocks
    with <DOCNO> and <TEXT> tags; whitespace around values trimmed."""
    raw = spark.read.text(path, wholetext=True)
    blocks = raw.select(
        F.explode(
            F.regexp_extract_all(
                F.col("value"), F.lit(r"(?s)<DOC>(.*?)</DOC>"), F.lit(1)
            )
        ).alias("block")
    )
    def ws_trim(c):
        # F.trim strips spaces only; TREC values are newline-padded
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    return blocks.select(
        ws_trim(F.regexp_extract("block", r"(?s)<DOCNO>(.*?)</DOCNO>", 1)).alias(
            "docno"
        ),
        ws_trim(F.regexp_extract("block", r"(?s)<TEXT>(.*?)</TEXT>", 1)).alias("text"),
    )


def read_enwiki(spark: SparkSession, path: str) -> DataFrame:
    """EnwikiContentSource subset (ByTask/Feeds/EnwikiContentSource.cs):
    extract (title, text) from Wikipedia-dump-style XML — <page> blocks
    with <title> and the <revision>'s <text> body. The reference runs a
    SAX parser over the same four fields (title/id/text/timestamp); this
    reader covers the title/text pair the benchmark indexes. Whole-file
    read + native regexp extraction, like read_trec."""
    raw = spark.read.text(path, wholetext=True)
    pages = raw.select(
        F.explode(
            F.regexp_extract_all(
                F.col("value"), F.lit(r"(?s)<page>(.*?)</page>"), F.lit(1)
            )
        ).alias("page")
    )

    def ws_trim(c):
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    return pages.select(
        ws_trim(F.regexp_extract("page", r"(?s)<title>(.*?)</title>", 1)).alias(
            "title"
        ),
        ws_trim(
            F.regexp_extract("page", r"(?s)<text[^>]*>(.*?)</text>", 1)
        ).alias("text"),
    )


def read_reuters(spark: SparkSession, path: str) -> DataFrame:
    """ReutersContentSource (ByTask/Feeds/ReutersContentSource.cs): one
    document per file — line 1 the date string, line 3 the title, line 5+
    the body with line breaks joined by single spaces (the reference
    appends ' ' per line). Returns (path, date, title, text). Date-string
    parsing into timestamps is left to the caller (the reference's
    culture-specific DateTime formats are out of scope)."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "path", F.input_file_name()
    )
    lines = F.split(F.col("value"), "\n")
    body = F.array_join(F.slice(lines, 5, F.greatest(F.size(lines) - 4, F.lit(0))), " ")
    return raw.select(
        "path",
        F.trim(F.element_at(lines, 1)).alias("date"),
        F.trim(F.element_at(lines, 3)).alias("title"),
        F.regexp_replace(body, r"\s+$", "").alias("text"),
    )


def read_geonames(spark: SparkSession, path: str) -> DataFrame:
    """GeonamesLineParser (ByTask/Feeds/GeonamesLineParser.cs): the
    geonames.org dump line format — TAB-separated, field 0 the numeric
    id, 1 the name, 4/5 latitude/longitude (the parser's ID/Name/Body
    mapping; body is the WKT point, x-y i.e. lon-lat order). Returns
    (geonameid, name, lat, lon, body)."""
    raw = spark.read.text(path)
    p = F.split(F.col("value"), SEP)
    lat = F.element_at(p, 5).cast("double")
    lon = F.element_at(p, 6).cast("double")
    return raw.select(
        F.element_at(p, 1).cast("long").alias("geonameid"),
        F.element_at(p, 2).alias("name"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.concat(
            F.lit("POINT("), lon.cast("string"), F.lit(" "), lat.cast("string"),
            F.lit(")"),
        ).alias("body"),
    )
