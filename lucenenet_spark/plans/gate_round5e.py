"""Gate registry part 5e: Queries-module filters (BoostingQuery,
ChainedFilter, BooleanFilter), Flexible/MultiField parser front-ends,
and PKIndexSplitter."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _Q,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)
from lucenenet_spark.plans.gate_fields import _SQL_SRC, get_engine2
from lucenenet_spark.search.queries import Occur, PrefixQuery, TermQuery


# ==========================================================================
# BoostingQuery (Lucene.Net.Queries/BoostingQuery.cs:41-106)
# ==========================================================================
@gate(
    "boosting_query",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, ctx AS (SELECT DISTINCT doc_id FROM post WHERE term = 'merge')
SELECT a.doc_id,
       CAST(floor(a.score * (CASE WHEN ctx.doc_id IS NOT NULL THEN 0.2 ELSE 1.0 END)
                  * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc('vector')}) a LEFT JOIN ctx ON a.doc_id = ctx.doc_id
""",
)
def boosting_query(spark, sf_dir):
    """match=vector demoted 5x on docs that also contain 'merge' —
    BoostingQuery's Coord override (overlap 2 → boost, 1 → 1.0,
    context-only → no hit)."""
    from lucenenet_spark.search.boosting import boosting_scored

    _, s, _ = get_engine(spark, sf_dir)
    return _spark_score_q(
        boosting_scored(s, TermQuery("vector"), TermQuery("merge"), boost=0.2)
    )


# ==========================================================================
# ChainedFilter (Lucene.Net.Queries/ChainedFilter.cs:43-262)
# ==========================================================================
@gate(
    "chained_filter",
    SQL_PRELUDE + """
, a AS (SELECT DISTINCT doc_id FROM post WHERE term = 'vector'),
b AS (SELECT DISTINCT doc_id FROM post WHERE term = 'merge'),
c AS (SELECT DISTINCT doc_id FROM post WHERE term = 'key'),
ab AS (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b)
SELECT doc_id FROM (
  (SELECT doc_id FROM ab EXCEPT SELECT doc_id FROM c)
  UNION
  (SELECT doc_id FROM c EXCEPT SELECT doc_id FROM ab)
)
""",
)
def chained_filter_gate(spark, sf_dir):
    """chain=[vector, merge, key] logic=[AND, ANDNOT, XOR]: InitialResult
    seeds with the first set (logic AND), subtracts 'merge', then
    symmetric-difference with 'key' — ChainedFilter.GetDocIdSet fold
    order exactly."""
    from lucenenet_spark.search.filters import AND, ANDNOT, XOR, chained_filter

    _, s, _ = get_engine(spark, sf_dir)
    return chained_filter(
        s,
        [TermQuery("vector"), TermQuery("merge"), TermQuery("key")],
        logic=[AND, ANDNOT, XOR],
    )


# ==========================================================================
# BooleanFilter (Lucene.Net.Queries/BooleanFilter.cs:36-110)
# ==========================================================================
@gate(
    "boolean_filter_docset",
    SQL_PRELUDE + """
, sh AS (
  SELECT DISTINCT doc_id FROM post WHERE term LIKE 'ma%' OR term = 'vector'
),
nt AS (SELECT DISTINCT doc_id FROM post WHERE term = 'merge')
SELECT doc_id FROM sh EXCEPT SELECT doc_id FROM nt
""",
)
def boolean_filter_docset(spark, sf_dir):
    """SHOULD(prefix ma*) ∪ SHOULD(vector) minus MUST_NOT(merge) —
    BooleanFilter's union-then-subtract algebra over non-scoring doc
    sets."""
    from lucenenet_spark.search.filters import boolean_filter

    _, s, _ = get_engine(spark, sf_dir)
    return boolean_filter(
        s,
        [
            (PrefixQuery("ma"), Occur.SHOULD),
            (TermQuery("vector"), Occur.SHOULD),
            (TermQuery("merge"), Occur.MUST_NOT),
        ],
    )


# ==========================================================================
# StandardQueryParser multi-field expansion
# (Flexible/Standard/StandardQueryParser.cs:66-139 +
#  Processors/MultiFieldQueryNodeProcessor.cs:40-103)
# ==========================================================================
_SRC_TSC_BOOSTED = (
    "SELECT p.doc_id, "
    "(ln(1 + (cs.n - st.df + 0.5) / (st.df + 0.5)) * 1.5) * 2.2 * p.tf "
    "/ (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (src_cs.sttf / cs.n))) AS score "
    "FROM src_post p JOIN src_ts st USING (term), cs, src_cs WHERE p.term = 'src3'"
)


@gate(
    "multifield_parser_query",
    SQL_PRELUDE + "," + _SQL_SCORED + "," + _SQL_SRC + f"""
, u AS (
  SELECT * FROM ({_tsc('vector')})
  UNION ALL
  SELECT * FROM ({_SRC_TSC_BOOSTED})
)
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM u GROUP BY doc_id
""",
)
def multifield_parser_query(spark, sf_dir):
    """'vector src3' with multi_fields=[text, source] and a 1.5x source
    boost: each field-less leaf fans out across both fields (the term
    absent from a field contributes nothing, as a 0-docFreq TermQuery);
    OR semantics sum the per-field BM25 partials."""
    from lucenenet_spark.queryparser.flexible import StandardQueryParser

    _, s = get_engine2(spark, sf_dir)
    p = StandardQueryParser(analyzer=s.index.analyzer)
    p.set_multi_fields(["text", "source"])
    p.set_fields_boost({"source": 1.5})
    q = p.parse("vector src3")
    return _spark_score_q(s.scored(q))


# ==========================================================================
# PKIndexSplitter (Misc/Index/PKIndexSplitter.cs:34-95)
# ==========================================================================
_PK_PRELUDE = (
    "WITH docs2 AS (SELECT * FROM documents WHERE doc_id % 10 < 3),\n"
    + SQL_PRELUDE.replace("WITH tok AS", "tok AS").replace(
        "FROM documents", "FROM docs2"
    )
)


@gate(
    "pk_split_term",
    _PK_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q
FROM ({_tsc('vector')})
""",
)
def pk_split_term(spark, sf_dir):
    """The doc_id%10<3 side of a PK split is a self-consistent index:
    df/avgdl/maxDoc (hence every BM25 score) reflect only the passing
    docs, exactly the reference's DocumentFilteredAtomicIndexReader +
    AddIndexes merge."""
    from lucenenet_spark.index.splitter import pk_split_index
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    passing, _failing = pk_split_index(idx, (F.col("doc_id") % 10) < 3)
    s = IndexSearcher(passing, mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# Line-level boilerplate dedup (RefinedWeb §3.2 / CCNet paragraph hashes —
# web-pipeline op, beyond the reference)
# ==========================================================================
@gate(
    "line_dedup_strip",
    """
WITH docs2 AS (
  SELECT doc_id,
         'cookie notice applies' || chr(10) || text || chr(10) ||
         'visit example dot com' AS text
  FROM documents
),
ln AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS line_no
  FROM docs2
),
boiler AS (
  SELECT line AS bline
  FROM (SELECT DISTINCT doc_id, line FROM ln)
  GROUP BY line HAVING count(*) >= 2
),
kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT bline FROM boiler)),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text,
         CAST(count(*) AS BIGINT) AS lines_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS lines_total FROM ln GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(r.text, '') AS text,
       coalesce(r.lines_kept, 0) AS lines_kept,
       t.lines_total - coalesce(r.lines_kept, 0) AS lines_dropped
FROM tot t LEFT JOIN reb r USING (doc_id)
""",
)
def line_dedup_strip(spark, sf_dir):
    """Wrap every doc in two boilerplate lines (page chrome repeated across
    the whole corpus), then strip every line whose exact hash occurs in
    >= 2 documents: the chrome vanishes everywhere, each doc's own line
    survives unless the corpus carries an exact-duplicate text (those
    collapse to empty, mirroring RefinedWeb's strip-then-length-filter
    staging)."""
    from lucenenet_spark.functions.linededup import strip_duplicate_lines

    _, _, docs = get_engine(spark, sf_dir)
    docs2 = docs.select(
        "doc_id",
        F.concat(
            F.lit("cookie notice applies\n"),
            F.col("text"),
            F.lit("\nvisit example dot com"),
        ).alias("text"),
    )
    return strip_duplicate_lines(docs2, min_df=2)


# ==========================================================================
# Per-host page cap (C4/RefinedWeb per-domain cap — web-pipeline op)
# ==========================================================================
from lucenenet_spark.functions.urls import host_sql_expr  # noqa: E402

_HOSTCAP_URL_SQL = (
    "'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) || "
    "'site' || CAST(doc_id % 7 AS VARCHAR) || "
    "(CASE WHEN doc_id % 5 = 0 THEN '.com:443' ELSE '.com' END) || "
    "'/p/' || CAST(doc_id AS VARCHAR)"
)


@gate(
    "host_cap_sample",
    f"""
WITH pages AS (
  SELECT doc_id, {_HOSTCAP_URL_SQL} AS url FROM documents
),
keyed AS (
  SELECT doc_id, url, {host_sql_expr('url')} AS host FROM pages
),
rn AS (
  SELECT doc_id, url,
         row_number() OVER (PARTITION BY host ORDER BY doc_id ASC) AS _rn
  FROM keyed
)
SELECT doc_id, url FROM rn WHERE _rn <= 10
""",
)
def host_cap_sample(spark, sf_dir):
    """Cap every host at 10 pages, earliest crawl first: www prefixes and
    default ports fold into one host key, so site0.com / www.site0.com /
    site0.com:443 compete for the same 10 slots — the per-domain cap a
    Common-Crawl-scale mix pipeline applies before training."""
    from lucenenet_spark.functions.urls import cap_per_host_skewed

    _, _, docs = get_engine(spark, sf_dir)
    www = F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    port = F.when(F.col("doc_id") % 5 == 0, F.lit(".com:443")).otherwise(F.lit(".com"))
    url = F.concat(
        F.lit("https://"), www,
        F.lit("site"), (F.col("doc_id") % 7).cast("string"), port,
        F.lit("/p/"), F.col("doc_id").cast("string"),
    )
    pages = docs.select(
        "doc_id", url.alias("url"),
        F.to_timestamp(F.lit("2026-01-01")).alias("warc_ts"),
    ).withColumn("warc_ts", F.col("warc_ts") + F.make_dt_interval(secs=F.col("doc_id")))
    return cap_per_host_skewed(pages, 10).select("doc_id", "url")


# ==========================================================================
# DocumentDictionary -> AnalyzingSuggester (Suggest/DocumentDictionary.cs)
# ==========================================================================
from lucenenet_spark.plans.gate import _STOPS  # noqa: E402


@gate(
    "document_dictionary_suggest",
    """
WITH ent AS (
  SELECT surface, CAST(max(w) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface,
           n_chars AS w
    FROM documents
  ) GROUP BY surface
),
an AS (
  SELECT surface, weight,
         array_to_string(
           list_filter(string_split(surface, ' '),
                       x -> x <> '' AND x NOT IN (""" + _STOPS + """)),
           chr(31)) AS analyzed
  FROM ent
)
SELECT surface, weight FROM an
WHERE analyzed LIKE 'vector%'
ORDER BY (analyzed = 'vector') DESC, weight DESC, surface ASC
LIMIT 5
""",
)
def document_dictionary_suggest(spark, sf_dir):
    """DocumentDictionary entries (surface = title field, weight = the
    stored numeric n_chars docvalue, max-aggregated per surface) feeding
    AnalyzingSuggester — the reference's dictionary-from-index build
    path, weights from doc values instead of popularity counts."""
    from lucenenet_spark.search.suggest import AnalyzingSuggester, document_dictionary

    _, _, docs = get_engine(spark, sf_dir)
    titled = docs.select(
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("title"),
        "n_chars",
    )
    ent = (
        document_dictionary(titled, field="title", weight_field="n_chars")
        .groupBy("surface")
        .agg(F.max("weight").alias("weight"))
    )
    return AnalyzingSuggester(ent).lookup("vector", 5)
