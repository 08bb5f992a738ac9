"""Gate registry part 5m: term vectors, JoinUtil scoring modes,
LiveFieldValues, collation-key sort, ParallelAtomicReader, and
CollectionStatistics — the remaining core-reader / module rows.

Each gate carries an independent DuckDB oracle over the same parquet
tables (quantization + naming conventions per gate.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery


# ==========================================================================
# IndexReader.GetTermVector(docID, field): the per-doc inverted view —
# (term, freq, first position) for a pinned doc subset (doc_id % 50 == 0,
# a stable ~2% sample). The postings table IS the term-vector store (the
# positions array rides on every posting), so this is a pushed predicate,
# not a second codec (IndexReader.cs GetTermVector;
# Codecs/Compressing/CompressingTermVectorsReader.cs).
# ==========================================================================
@gate(
    "term_vector_topterms",
    SQL_PRELUDE + """
SELECT doc_id, term,
       CAST(count(*) AS BIGINT) AS tf,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM tokf WHERE doc_id % 50 = 0
GROUP BY doc_id, term
""",
)
def term_vector_topterms(spark, sf_dir):
    from lucenenet_spark.search.misc import term_vector

    idx, _s, docs = get_engine(spark, sf_dir)
    sample = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id")
    return term_vector(idx, doc_ids=sample)


# ==========================================================================
# JoinUtil.CreateJoinQuery with ScoreMode.Max (JoinUtil.cs:77-82 →
# TermsWithScoreCollector + TermsIncludingScoreQuery): from-side docs
# matching `dup` are BM25-scored, the MAX score per `source` value is
# collected, and every to-side doc with that source scores the collected
# max. ScoreMode.None is the unscored path already covered by
# join_by_source.
# ==========================================================================
@gate(
    "join_score_max",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, fs AS ({_tsc("dup")}),
pv AS (
  SELECT d.source, max(fs.score) AS js
  FROM fs JOIN documents d USING (doc_id) GROUP BY d.source
)
SELECT d2.doc_id, CAST(floor(pv.js * 10000 + 0.5) AS BIGINT) AS score_q
FROM documents d2 JOIN pv ON pv.source = d2.source
""",
)
def join_score_max(spark, sf_dir):
    from lucenenet_spark.search.joins import join_util_scored

    _idx, s, docs = get_engine(spark, sf_dir)
    scored = s.scored(TermQuery("dup"))
    attrs = docs.select("doc_id", "source")
    joined = join_util_scored(scored, attrs, attrs, join_col="source", score_mode="max")
    return _spark_score_q(joined)


# ==========================================================================
# LiveFieldValues (Search/LiveFieldValues.cs): read-your-writes overlay.
# Committed state is (doc_id -> source); the pending-write set is the
# deterministic doc_id % 13 == 0 slice (value 'pending_<id>'), with the
# % 26 == 0 half marked deleted. The whole-table view must serve pending
# values first, hide pending deletes, and fall through elsewhere.
# ==========================================================================
@gate(
    "live_field_values",
    """
SELECT doc_id,
       CASE WHEN doc_id % 13 = 0 THEN 'pending_' || CAST(doc_id AS VARCHAR)
            ELSE source END AS value
FROM documents
WHERE doc_id % 26 <> 0
""",
)
def live_field_values(spark, sf_dir):
    from lucenenet_spark.streaming.incremental import live_overlay

    _idx, _s, docs = get_engine(spark, sf_dir)
    committed = docs.select("doc_id", F.col("source").alias("value"))
    pending = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.concat(F.lit("pending_"), F.col("doc_id").cast("string")).alias("value"),
        (F.col("doc_id") % 26 == 0).alias("deleted"),
    )
    return live_overlay(committed, pending)


# ==========================================================================
# ICUCollationKeyAnalyzer (Analysis.ICU/Collation/ICUCollationKeyAnalyzer.cs):
# locale sort via a derived collation key, German DIN 5007-2 phonebook
# tailoring (documented subset — analysis/collation.py). Titles are a
# deterministic umlaut-bearing pick per doc; the sorted prefix shows
# Müller == mueller primary equality and Äpfel < Bach ordering.
# ==========================================================================
_COLLATION_WORDS = (
    "Müller", "mueller", "Äpfel", "apfelbaum", "Österreich",
    "oel", "über", "zebra", "Straße", "strasse",
)
_SQL_WORDS = "[" + ", ".join(f"'{w}'" for w in _COLLATION_WORDS) + "]"


@gate(
    "collation_key_sort",
    f"""
WITH t AS (
  SELECT doc_id,
         ({_SQL_WORDS})[CAST(doc_id % 10 AS INTEGER) + 1] AS title
  FROM documents
),
k AS (
  SELECT doc_id, title,
         replace(replace(replace(replace(lower(title),
             'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'), 'ß', 'ss') AS ckey
  FROM t
)
SELECT doc_id, title, ckey FROM k
ORDER BY ckey ASC, doc_id ASC LIMIT 40
""",
)
def collation_key_sort(spark, sf_dir):
    from lucenenet_spark.analysis.collation import collation_sort

    _idx, _s, docs = get_engine(spark, sf_dir)
    words = F.array(*[F.lit(w) for w in _COLLATION_WORDS])
    titled = docs.select(
        "doc_id", F.element_at(words, (F.col("doc_id") % 10 + 1).cast("int")).alias("title")
    )
    return collation_sort(titled, "title", k=40)


# ==========================================================================
# ParallelAtomicReader (Index/ParallelAtomicReader.cs): text index and
# source index are built SEPARATELY over the same doc ids, then presented
# as one multi-field reader; the cross-field conjunction text:vector AND
# source:src3 must score exactly like the single 2-field build
# (field_term_query's oracle, reproduced here).
# ==========================================================================
_SQL_SRC_PAR = """
src_post AS (
  SELECT doc_id, source AS term, CAST(1 AS BIGINT) AS tf, CAST(1 AS BIGINT) AS dl
  FROM documents
),
src_ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM src_post GROUP BY term
),
src_cs AS (
  SELECT CAST(count(*) AS DOUBLE) AS sttf FROM src_post
)
"""


def _src_tsc_par(term: str) -> str:
    return (
        "SELECT p.doc_id, "
        "ln(1 + (cs.n - st.df + 0.5) / (st.df + 0.5)) * 2.2 * p.tf "
        "/ (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (src_cs.sttf / cs.n))) AS score "
        f"FROM src_post p JOIN src_ts st USING (term), cs, src_cs WHERE p.term = '{term}'"
    )


_PAR_CACHE: dict[str, object] = {}


def _parallel_searcher(spark, sf_dir):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.index.parallel import parallel_reader
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _PAR_CACHE:
        _idx, _s, docs = get_engine(spark, sf_dir)
        text_ix = build_index(docs, id_col="doc_id")
        src_ix = build_index(docs, id_col="doc_id", fields=["source"])
        _PAR_CACHE[key] = IndexSearcher(parallel_reader(text_ix, src_ix), mode="double")
    return _PAR_CACHE[key]


@gate(
    "parallel_reader_term",
    SQL_PRELUDE + "," + _SQL_SCORED + "," + _SQL_SRC_PAR + f"""
SELECT a.doc_id,
       CAST(floor((a.score + b.score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc("vector")}) a JOIN ({_src_tsc_par("src3")}) b USING (doc_id)
""",
)
def parallel_reader_term(spark, sf_dir):
    s = _parallel_searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("vector"), Occur.MUST),
        (TermQuery("src3", field="source"), Occur.MUST),
    )
    return _spark_score_q(s.scored(q))


# ==========================================================================
# IndexSearcher.CollectionStatistics (IndexSearcher.cs:1129-1154): the
# per-field (maxDoc, docCount, sumDocFreq, sumTotalTermFreq) quadruple —
# metadata aggregates only, no postings scan.
# ==========================================================================
@gate(
    "collection_stats",
    SQL_PRELUDE + """
SELECT 'text' AS field,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS max_doc,
       CAST((SELECT count(DISTINCT doc_id) FROM tokf) AS BIGINT) AS doc_count,
       CAST((SELECT sum(df) FROM ts) AS BIGINT) AS sum_df,
       CAST((SELECT sum(ttf) FROM ts) AS BIGINT) AS sum_ttf
""",
)
def collection_stats(spark, sf_dir):
    from lucenenet_spark.search.misc import collection_statistics

    idx, _s, _docs = get_engine(spark, sf_dir)
    return collection_statistics(idx)


# ==========================================================================
# SmartChineseAnalyzer (Analysis.SmartCn/SmartChineseAnalyzer.cs:49,156-166):
# 'key value' fused to the compound 智能分词, segmented back by the user
# dictionary {智能, 分词}; the Porter leg of the chain (PorterStemFilter
# over embedded Latin) is exercised by querying the STEM 'merg' — the
# conjunction returns docs with the original adjacent pair AND any
# 'merge' token.
# ==========================================================================
@gate(
    "smartcn_analysis",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a
JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
JOIN tok c ON c.doc_id = a.doc_id
WHERE a.term = 'key' AND b.term = 'value' AND c.term = 'merge'
""",
)
def smartcn_analysis(spark, sf_dir):
    from lucenenet_spark.analysis.analyzers import SmartChineseAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _idx, _s, docs = get_engine(spark, sf_dir)
    fused = docs.select(
        "doc_id", F.regexp_replace("text", "key value", "智能分词").alias("text")
    )
    ix = build_index(fused, analyzer=SmartChineseAnalyzer(user_dict=["智能", "分词"]))
    s = IndexSearcher(ix, mode="double")
    q = BooleanQuery.of(
        (TermQuery("分词"), Occur.MUST), (TermQuery("merg"), Occur.MUST)
    )
    return s.docset(q)


# ==========================================================================
# TokenSources highlighting (Highlighter/TokenSources.cs): fragments are
# rebuilt from the INDEX term vector (positions on the postings row), not
# by re-analysis — first occurrence of 'vector' ± 3 tokens, hits wrapped,
# n_hits = doc tf. Pure Column plan: one postings->stored-fields join.
# ==========================================================================
@gate(
    "token_sources_highlight",
    SQL_PRELUDE + """
, hit AS (
  SELECT doc_id, CAST(min(pos) AS INTEGER) AS p,
         CAST(count(*) AS INTEGER) AS n_hits
  FROM tokf WHERE term = 'vector' GROUP BY doc_id
),
base AS (
  SELECT h.doc_id, h.p, h.n_hits, string_split(d.text, ' ') AS toks
  FROM hit h JOIN documents d USING (doc_id)
)
SELECT doc_id,
       array_to_string(
         list_transform(
           toks[greatest(0, p - 3) + 1 : p + 3 + 1],
           x -> CASE WHEN x = 'vector' THEN '<b>' || x || '</b>' ELSE x END
         ), ' ') AS fragment,
       n_hits
FROM base
""",
)
def token_sources_highlight_gate(spark, sf_dir):
    from lucenenet_spark.search.highlight import token_sources_highlight

    idx, _s, docs = get_engine(spark, sf_dir)
    return token_sources_highlight(idx, docs, "vector", context=3)
