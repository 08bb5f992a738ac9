"""Driver-gate query registry: every implemented operator as a
(spark_builder, duckdb_oracle_sql) pair over /root/testdata tables.

Contract (TESTDATA.md / driver): the Spark query and the DuckDB SQL run on
the same parquet at sf=0.01 and must agree on row count, schema, and an
order-insensitive value hash. Determinism rules used throughout:

- BM25 scores are computed in *double* on both sides with structurally
  identical expressions, then quantized to a bigint ``score_q =
  floor(score*10000 + 0.5)`` — the multiply/add/floor are the same IEEE ops
  in both engines, so the bigint is bit-stable (a raw double hash is not,
  because JVM Math.log and libm log may differ in the last ulp).
- Every LIMIT has a total order: (score_q DESC, doc_id ASC) etc. —
  mirroring the reference's HitQueue tie-break (HitQueue.cs:88).
- Tokenization of the synthetic corpus (lowercase, space-separated) is
  replicated in SQL as string_split + the exact 33-word stop set, matching
  the engine's StandardAnalyzer output on this alphabet.

The float32/SmallFloat *Lucene-parity* scoring path is exercised separately
by tests/test_search_parity.py against the pure-Python oracle; the gate's
double mode shares the same plans (same joins/aggregations), only the score
expression differs.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
from lucenenet_spark.index.builder import InvertedIndex, build_index
from lucenenet_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher

# --------------------------------------------------------------------------
# shared SQL prelude: tokenize -> postings -> doclens -> stats, in DuckDB
# --------------------------------------------------------------------------
_STOPS = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

SQL_PRELUDE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokf AS (
  SELECT doc_id, term, pos FROM tok
  WHERE term <> '' AND term NOT IN ({_STOPS})
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf
  FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
"""

# per-(doc,term) BM25 partials; avgdl = sttf/n exactly as the engine's
# avgdl_double = sum_ttf / max_doc
_SQL_SCORED = """
sc AS (
  SELECT p.doc_id, p.term, p.tf, dl.dl, ts.df,
         ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) AS idf,
         1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)) AS nrm
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
)
"""


def _tsc(term: str, boost: float = 1.0) -> str:
    """SQL per-doc score rows for one term: (idf*boost)*2.2*tf/(tf+nrm),
    structurally identical to IndexSearcher double mode."""
    bexpr = "idf" if boost == 1.0 else f"(idf * {boost!r})"
    return (
        f"SELECT doc_id, {bexpr} * 2.2 * tf / (tf + nrm) AS score "
        f"FROM sc WHERE term = '{term}'"
    )


_Q = "CAST(floor(score * 10000 + 0.5) AS BIGINT)"


def _spark_score_q(df: DataFrame) -> DataFrame:
    return df.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# --------------------------------------------------------------------------
# index / table caches (per sf_dir)
# --------------------------------------------------------------------------
_CACHE: dict[str, tuple[InvertedIndex, IndexSearcher, DataFrame]] = {}


def get_engine(spark: SparkSession, sf_dir: str) -> tuple[InvertedIndex, IndexSearcher, DataFrame]:
    key = os.path.abspath(sf_dir)
    if key not in _CACHE:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(docs, text_col="text", id_col="doc_id").cache()
        searcher = IndexSearcher(idx, mode="double")
        _CACHE[key] = (idx, searcher, docs)
    return _CACHE[key]


def _docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return get_engine(spark, sf_dir)[2]


GATE_QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def gate(name: str, sql: str | None):
    def deco(fn):
        GATE_QUERIES[name] = (fn, sql)
        return fn

    return deco


# ==========================================================================
# Leaf + boolean + phrase queries (SURVEY.md §2.4/§2.5)
# ==========================================================================
@gate(
    "term_query",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('vector')})
""",
)
def term_query(spark, sf_dir):
    """TermQuery, all matching docs (TermQuery.cs / TermScorer.cs)."""
    _, s, _ = get_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("vector")))


@gate(
    "term_query_topk",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('vector')})
ORDER BY score_q DESC, doc_id ASC LIMIT 10
""",
)
def term_query_topk(spark, sf_dir):
    """Top-k BM25 (TopScoreDocCollector.cs:30-148): score DESC, doc_id ASC."""
    _, s, _ = get_engine(spark, sf_dir)
    scored = _spark_score_q(s.scored(TermQuery("vector")))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(10)


@gate(
    "boolean_and",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT a.doc_id, CAST(floor((a.score + b.score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc('vector')}) a JOIN ({_tsc('merge')}) b USING (doc_id)
""",
)
def boolean_and(spark, sf_dir):
    """ConjunctionScorer = inner join on doc_id, scores summed."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of((TermQuery("vector"), Occur.MUST), (TermQuery("merge"), Occur.MUST))
    return _spark_score_q(s.scored(q))


@gate(
    "boolean_or",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (({_tsc('vector')}) UNION ALL ({_tsc('merge')}))
GROUP BY doc_id
""",
)
def boolean_or(spark, sf_dir):
    """DisjunctionSumScorer = union + groupBy sum (BooleanScorer bucket table)."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of((TermQuery("vector"), Occur.SHOULD), (TermQuery("merge"), Occur.SHOULD))
    return _spark_score_q(s.scored(q))


@gate(
    "boolean_not",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT a.doc_id, {_Q} AS score_q
FROM ({_tsc('vector')}) a
WHERE a.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
""",
)
def boolean_not(spark, sf_dir):
    """ReqExclScorer = left anti join."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of((TermQuery("vector"), Occur.MUST), (TermQuery("dup"), Occur.MUST_NOT))
    return _spark_score_q(s.scored(q))


@gate(
    "boolean_msm",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (({_tsc('key')}) UNION ALL ({_tsc('agg')}) UNION ALL ({_tsc('scan')}))
GROUP BY doc_id HAVING count(*) >= 2
""",
)
def boolean_msm(spark, sf_dir):
    """MinShouldMatchSumScorer = HAVING count >= n."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("key"), Occur.SHOULD),
        (TermQuery("agg"), Occur.SHOULD),
        (TermQuery("scan"), Occur.SHOULD),
        minimum_should_match=2,
    )
    return _spark_score_q(s.scored(q))


@gate(
    "boolean_mixed",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT m.doc_id,
       CAST(floor((m.score + coalesce(o.score, 0.0)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc('key')}) m
LEFT JOIN ({_tsc('agg')}) o USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
""",
)
def boolean_mixed(spark, sf_dir):
    """ReqOptSumScorer (+ exclusion): MUST + optional SHOULD + MUST_NOT."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("key"), Occur.MUST),
        (TermQuery("agg"), Occur.SHOULD),
        (TermQuery("dup"), Occur.MUST_NOT),
    )
    return _spark_score_q(s.scored(q))


@gate(
    "boost_query",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (({_tsc('vector', 2.0)}) UNION ALL ({_tsc('merge')}))
GROUP BY doc_id
""",
)
def boost_query(spark, sf_dir):
    """Query boosts folded into term weight (BM25Stats.Normalize)."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("vector", boost=2.0), Occur.SHOULD), (TermQuery("merge"), Occur.SHOULD)
    )
    return _spark_score_q(s.scored(q))


@gate(
    "phrase_query",
    SQL_PRELUDE + "," + _SQL_SCORED + """,
pf AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS freq
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'key' AND b.term = 'agg'
  GROUP BY a.doc_id
),
idfs AS (
  SELECT ((SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'key')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'agg')) AS idf
)
SELECT pf.doc_id,
       CAST(floor((idfs.idf * 2.2 * pf.freq /
             (pf.freq + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
       AS score_q
FROM pf JOIN dl USING (doc_id), idfs, cs
""",
)
def phrase_query(spark, sf_dir):
    """ExactPhraseScorer: position-join intersection, summed idf weight."""
    _, s, _ = get_engine(spark, sf_dir)
    return _spark_score_q(s.scored(PhraseQuery(terms=("key", "agg"))))


@gate(
    "dismax_query",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id,
       CAST(floor((max(score) + 0.1 * (sum(score) - max(score))) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (({_tsc('vector')}) UNION ALL ({_tsc('merge')}))
GROUP BY doc_id
""",
)
def dismax_query(spark, sf_dir):
    """DisjunctionMaxScorer: max + tieBreaker*(sum-max)."""
    _, s, _ = get_engine(spark, sf_dir)
    q = DisjunctionMaxQuery(queries=(TermQuery("vector"), TermQuery("merge")), tie_breaker=0.1)
    return _spark_score_q(s.scored(q))


# ==========================================================================
# MultiTermQuery family (term-dictionary rewrites, SURVEY.md §2.4)
# ==========================================================================
@gate(
    "prefix_query",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE term LIKE 'du%'
""",
)
def prefix_query(spark, sf_dir):
    """PrefixQuery under CONSTANT_SCORE rewrite → matching-doc set."""
    _, s, _ = get_engine(spark, sf_dir)
    return s.docset(PrefixQuery("du"))


@gate(
    "wildcard_query",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE regexp_matches(term, '^s.*k$')
""",
)
def wildcard_query(spark, sf_dir):
    """WildcardQuery s*k (matches 'spark') via term-dict regex."""
    _, s, _ = get_engine(spark, sf_dir)
    return s.docset(WildcardQuery("s*k"))


@gate(
    "term_range_query",
    SQL_PRELUDE + """
SELECT term, df, ttf FROM ts WHERE term >= 'scan' AND term <= 'table'
""",
)
def term_range_query(spark, sf_dir):
    """TermRangeQuery surfaced as a dictionary range scan (TermRangeQuery.cs)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return idx.term_stats.filter((F.col("term") >= "scan") & (F.col("term") <= "table")).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


@gate(
    "fuzzy_query",
    SQL_PRELUDE + """
SELECT term, df FROM ts WHERE levenshtein(term, 'tabl') <= 1
""",
)
def fuzzy_query(spark, sf_dir):
    """FuzzyQuery candidate expansion: levenshtein over the term dictionary
    (FuzzyTermsEnum.cs) — JVM-side levenshtein, length-window pruned."""
    idx, _, _ = get_engine(spark, sf_dir)
    t = "tabl"
    return (
        idx.term_stats.filter(
            (F.length("term") >= len(t) - 1) & (F.length("term") <= len(t) + 1)
        )
        .filter(F.levenshtein(F.col("term"), F.lit(t)) <= 1)
        .select("term", F.col("df").cast("long"))
    )


@gate(
    "high_freq_terms",
    SQL_PRELUDE + """
SELECT term, df, ttf FROM ts ORDER BY df DESC, term ASC LIMIT 10
""",
)
def high_freq_terms(spark, sf_dir):
    """HighFreqTerms utility (Lucene.Net.Misc/Misc/HighFreqTerms.cs)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return (
        idx.term_stats.select("term", F.col("df").cast("long"), F.col("ttf").cast("long"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(10)
    )


# ==========================================================================
# Collectors / facets / grouping / sort / join (SURVEY.md §2.6)
# ==========================================================================
@gate(
    "total_hits",
    SQL_PRELUDE + """
SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_hits
FROM post WHERE term IN ('vector', 'merge')
""",
)
def total_hits(spark, sf_dir):
    """TotalHitCountCollector."""
    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of((TermQuery("vector"), Occur.SHOULD), (TermQuery("merge"), Occur.SHOULD))
    n = s.count(q)
    return spark.createDataFrame([(n,)], "n_hits long")


@gate(
    "facet_lang",
    """
SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
""",
)
def facet_lang(spark, sf_dir):
    """FacetsCollector + taxonomy counts ≈ groupBy().count()."""
    docs = _docs_table(spark, sf_dir)
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))


@gate(
    "facet_source_term",
    SQL_PRELUDE + """
SELECT d.source, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'vector') m
JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def facet_source_term(spark, sf_dir):
    """Facet counts restricted to a query's matches (DrillDownQuery shape)."""
    _, s, docs = get_engine(spark, sf_dir)
    m = s.docset(TermQuery("vector"))
    return m.join(docs.select("doc_id", "source"), "doc_id").groupBy("source").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@gate(
    "facet_range_nchars",
    """
SELECT CASE WHEN n_chars < 100 THEN 'short'
            WHEN n_chars < 300 THEN 'mid'
            ELSE 'long' END AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM documents GROUP BY 1
""",
)
def facet_range_nchars(spark, sf_dir):
    """LongRangeFacetCounts ≈ CASE bucketing + groupBy."""
    docs = _docs_table(spark, sf_dir)
    bucket = (
        F.when(F.col("n_chars") < 100, "short")
        .when(F.col("n_chars") < 300, "mid")
        .otherwise("long")
    )
    return docs.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@gate(
    "sort_by_field",
    SQL_PRELUDE + """
SELECT m.doc_id, d.n_chars
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'key') m
JOIN documents d USING (doc_id)
ORDER BY d.n_chars DESC, m.doc_id ASC LIMIT 20
""",
)
def sort_by_field(spark, sf_dir):
    """TopFieldCollector: top-k by an arbitrary SortField."""
    _, s, docs = get_engine(spark, sf_dir)
    m = s.docset(TermQuery("key"))
    return (
        m.join(docs.select("doc_id", "n_chars"), "doc_id")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
    )


@gate(
    "group_topk",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT source, doc_id, score_q FROM (
  SELECT d.source, x.doc_id, {_Q} AS score_q,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY {_Q} DESC, x.doc_id ASC) AS rn
  FROM ({_tsc('table')}) x JOIN documents d USING (doc_id)
) WHERE rn <= 2
""",
)
def group_topk(spark, sf_dir):
    """Grouping module (TermSecondPassGroupingCollector): top-k docs per
    group = window row_number over (group, score)."""
    from pyspark.sql import Window

    _, s, docs = get_engine(spark, sf_dir)
    scored = _spark_score_q(s.scored(TermQuery("table"))).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("source", "doc_id", "score_q")
    )


@gate(
    "join_by_source",
    SQL_PRELUDE + """
SELECT DISTINCT d2.doc_id
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'dup') m
JOIN documents d1 ON d1.doc_id = m.doc_id
JOIN documents d2 ON d2.source = d1.source
""",
)
def join_by_source(spark, sf_dir):
    """JoinUtil.CreateJoinQuery: docs matching a query on fromField mapped
    to docs sharing the toField value (Lucene.Net.Join/JoinUtil.cs:30)."""
    _, s, docs = get_engine(spark, sf_dir)
    m = s.docset(TermQuery("dup"))
    sources = m.join(docs.select("doc_id", "source"), "doc_id").select("source").distinct()
    return docs.join(F.broadcast(sources), "source").select("doc_id").distinct()
