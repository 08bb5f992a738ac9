"""Gate registry part 4: multi-field indexing (Term=(field,term)) and
MultiPhraseQuery.

field_term_query exercises the full per-field stack: a 2-field index
(text + source), per-field df/sumTotalTermFreq/avgdl/norms (reference:
Index/Term.cs:34; BM25Similarity.cs:91-102 stats are per-field;
NormsConsumerPerField.cs:56), cross-field boolean composition, and the
parser-visible `field:term` addressing. idf uses the GLOBAL maxDoc
(IndexSearcher.CollectionStatistics: maxDoc is collection-wide) while
avgdl is the field's sumTotalTermFreq / maxDoc.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from lucenenet_spark.index.builder import InvertedIndex, build_index
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _Q, _tsc, _spark_score_q, gate, get_engine
from lucenenet_spark.search.queries import BooleanQuery, MultiPhraseQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

# --------------------------------------------------------------------------
# 2-field engine cache (text + source-as-text)
# --------------------------------------------------------------------------
_CACHE2: dict[str, tuple[InvertedIndex, IndexSearcher]] = {}


def get_engine2(spark: SparkSession, sf_dir: str) -> tuple[InvertedIndex, IndexSearcher]:
    key = os.path.abspath(sf_dir)
    if key not in _CACHE2:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(docs, fields=["text", "source"], id_col="doc_id").cache()
        _CACHE2[key] = (idx, IndexSearcher(idx, mode="double"))
    return _CACHE2[key]


# source column is a single lowercase token per doc, so its per-field
# postings in SQL are (doc_id, source, tf=1, dl=1); its sumTotalTermFreq
# is count(documents) and avgdl_source = sttf_src / n.
_SQL_SRC = """
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


def _src_tsc(term: str) -> str:
    """Per-doc double BM25 score rows for one source-field term —
    structurally identical to IndexSearcher double mode with the SOURCE
    field's avgdl (per-field CollectionStatistics) and the global n."""
    return (
        "SELECT p.doc_id, "
        "ln(1 + (cs.n - st.df + 0.5) / (st.df + 0.5)) * 2.2 * p.tf "
        "/ (p.tf + 1.2 * (0.25 + 0.75 * p.dl / (src_cs.sttf / cs.n))) AS score "
        f"FROM src_post p JOIN src_ts st USING (term), cs, src_cs WHERE p.term = '{term}'"
    )


@gate(
    "field_term_query",
    SQL_PRELUDE + "," + _SQL_SCORED + "," + _SQL_SRC + f"""
SELECT a.doc_id,
       CAST(floor((a.score + b.score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc('vector')}) a JOIN ({_src_tsc('src3')}) b USING (doc_id)
""",
)
def field_term_query(spark, sf_dir):
    """Cross-field conjunction text:vector AND source:src3 over a 2-field
    index — Term=(field, bytes) end-to-end with per-field norms/avgdl."""
    _, s = get_engine2(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("vector"), Occur.MUST),
        (TermQuery("src3", field="source"), Occur.MUST),
    )
    return _spark_score_q(s.scored(q))


@gate(
    "field_parser_query",
    SQL_PRELUDE + "," + _SQL_SRC + """
SELECT DISTINCT p.doc_id
FROM post p JOIN src_post sp USING (doc_id)
WHERE p.term = 'merge' AND sp.term = 'src7'
""",
)
def field_parser_query(spark, sf_dir):
    """`source:src7 AND merge` through the classic parser's field: syntax
    (Classic/QueryParserBase.cs field defaulting; demo SearchFiles.cs)."""
    _, s = get_engine2(spark, sf_dir)
    from lucenenet_spark.queryparser.parser import QueryParser

    q = QueryParser(default_operator="AND", analyzer=s.index.analyzer).parse(
        "source:src7 AND merge"
    )
    return s.docset(q)


@gate(
    "multi_phrase",
    SQL_PRELUDE + """,
mpf AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS freq
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'key' AND b.term IN ('agg', 'row')
  GROUP BY a.doc_id
),
midfs AS (
  SELECT ((SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'key')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'agg')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'row')) AS idf
)
SELECT mpf.doc_id,
       CAST(floor((midfs.idf * 2.2 * mpf.freq /
             (mpf.freq + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
       AS score_q
FROM mpf JOIN dl USING (doc_id), midfs, cs
""",
)
def multi_phrase(spark, sf_dir):
    """MultiPhraseQuery "key (agg|row)" (Search/MultiPhraseQuery.cs;
    tests src/Lucene.Net.Tests/Search/TestMultiPhraseQuery.cs): per-slot
    position union, then the exact-phrase intersect; weight = summed idf
    over every term of every slot."""
    _, s, _ = get_engine(spark, sf_dir)
    q = MultiPhraseQuery(term_arrays=(("key",), ("agg", "row")))
    return _spark_score_q(s.scored(q))


# ==========================================================================
# ClassicSimilarity (TFIDF) — the queryNorm/coord path behind the
# Similarity seam (Search/Similarities/TFIDFSimilarity.cs,
# DefaultSimilarity.cs). Double mode uses the exact lengthNorm 1/sqrt(dl)
# on both sides (quantized-norm float32 parity is covered by
# tests/test_round2.py::test_classic_similarity_parity).
# ==========================================================================
@gate(
    "tfidf_term_query",
    SQL_PRELUDE + """,
w AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = 'vector'
),
vals AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM w
)
SELECT p.doc_id,
       CAST(floor((sqrt(p.tf) * vals.value * (1 / sqrt(dl.dl))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id), vals
WHERE p.term = 'vector'
""",
)
def tfidf_term_query(spark, sf_dir):
    """TermQuery under ClassicSimilarity: idf^2 * queryNorm * sqrt(tf) *
    lengthNorm (TFIDFSimilarity.IDFStats / TFIDFSimScorer)."""
    from pyspark.sql import functions as F

    idx, _, _ = get_engine(spark, sf_dir)
    s = IndexSearcher(idx, mode="double", similarity="classic")
    return s.scored(TermQuery("vector")).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


@gate(
    "tfidf_bool_or",
    SQL_PRELUDE + """,
w AS (
  SELECT term, ln(cs.n / (ts.df + 1)) + 1 AS idf,
         (ln(cs.n / (ts.df + 1)) + 1) * (CASE term WHEN 'vector' THEN 2.0 ELSE 1.0 END) AS qw
  FROM ts, cs WHERE term IN ('vector', 'merge')
),
nrm AS (SELECT 1 / sqrt(sum(qw * qw) * (1.0 * 1.0)) AS qn FROM w),
vals AS (SELECT term, qw * (nrm.qn * 1.0) * idf AS value FROM w, nrm),
parts AS (
  SELECT p.doc_id, sqrt(p.tf) * v.value * (1 / sqrt(dl.dl)) AS part
  FROM post p JOIN vals v USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id,
       CAST(floor(sum(part) * (count(*) / 2.0) * 10000 + 0.5) AS BIGINT) AS score_q
FROM parts GROUP BY doc_id
""",
)
def tfidf_bool_or(spark, sf_dir):
    """Boolean OR under ClassicSimilarity: queryNorm over both boosted
    weights + coord(overlap/2) (BooleanWeight/BooleanScorer2 coordFactors)."""
    from pyspark.sql import functions as F

    idx, _, _ = get_engine(spark, sf_dir)
    s = IndexSearcher(idx, mode="double", similarity="classic")
    q = BooleanQuery.of(
        (TermQuery("vector", boost=2.0), Occur.SHOULD),
        (TermQuery("merge"), Occur.SHOULD),
    )
    return s.scored(q).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
