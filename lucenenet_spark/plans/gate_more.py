"""Gate registry part 3: numeric/time ranges, span queries, rescoring,
MoreLikeThis, SimHash, sloppy phrase, LSH-ANN.

SimHash gets an EXACT SQL oracle: all arithmetic is integer (md5 hex-digit
bit extraction, +/-tf sums, sign, power-of-two reassembly), so both engines
agree bit-for-bit with no float concerns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.functions import dedup as fdedup
from lucenenet_spark.functions import similarity as fsim
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _Q, _tsc, _docs_table, gate, get_engine
from lucenenet_spark.search.collectors import rescore
from lucenenet_spark.search.mlt import more_like_this_query
from lucenenet_spark.search.queries import PhraseQuery, TermQuery
from lucenenet_spark.search.spans import span_first_docs, span_near_docs


# ==========================================================================
# Numeric / time range queries (NumericRangeQuery.cs:59-132 -> native
# predicates + parquet min/max pruning; DateTools -> date functions)
# ==========================================================================
@gate(
    "numeric_range_events",
    """
SELECT event_id, user_id
FROM events
WHERE value >= 5.0 AND value < 20.0 AND event_type = 'click'
""",
)
def numeric_range_events(spark, sf_dir):
    """NumericRangeQuery + term filter as native column predicates — the
    trie-term encoding is obsolete under Spark (SURVEY.md §4.1); the
    filters push down to the parquet scan."""
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.filter(
        (F.col("value") >= 5.0) & (F.col("value") < 20.0) & (F.col("event_type") == "click")
    ).select("event_id", "user_id")


@gate(
    "time_bucket_counts",
    """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
""",
)
def time_bucket_counts(spark, sf_dir):
    """DateTools-style time bucketing + facet counts (tumbling day)."""
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))


# ==========================================================================
# Span queries (Search/Spans/) — position-join docsets
# ==========================================================================
@gate(
    "span_near_ordered",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b
  ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 3
WHERE a.term = 'key' AND b.term = 'scan'
""",
)
def span_near_ordered(spark, sf_dir):
    """SpanNearQuery(ordered, slop=3) on (key .. scan)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return span_near_docs(idx, ["key", "scan"], slop=3, in_order=True)


@gate(
    "span_near_unordered",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b
  ON b.doc_id = a.doc_id AND a.pos <> b.pos
     AND abs(b.pos - a.pos) - 1 <= 2
WHERE a.term = 'key' AND b.term = 'scan'
""",
)
def span_near_unordered(spark, sf_dir):
    """SpanNearQuery(unordered, slop=2)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return span_near_docs(idx, ["key", "scan"], slop=2, in_order=False)


@gate(
    "span_first",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM tok WHERE term = 'table' AND pos < 5
""",
)
def span_first(spark, sf_dir):
    """SpanFirstQuery: term within the first 5 positions."""
    idx, _, _ = get_engine(spark, sf_dir)
    return span_first_docs(idx, "table", 5)


# ==========================================================================
# Rescoring (Search/QueryRescorer.cs)
# ==========================================================================
@gate(
    "rescore_topk",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, first_pass AS (
  SELECT doc_id, score FROM ({_tsc('table')})
  ORDER BY {_Q} DESC, doc_id ASC LIMIT 50
)
SELECT f.doc_id,
       CAST(floor((f.score + coalesce(s.score, 0.0)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM first_pass f LEFT JOIN ({_tsc('vector')}) s USING (doc_id)
ORDER BY score_q DESC, f.doc_id ASC LIMIT 10
""",
)
def rescore_topk(spark, sf_dir):
    """QueryRescorer: top-50 of 'table' re-ranked by adding 'vector' score."""
    _, s, _ = get_engine(spark, sf_dir)
    out = rescore(s, TermQuery("table"), TermQuery("vector"), n=50, k=10)
    return out.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# MoreLikeThis (Queries/Mlt/MoreLikeThis.cs) — rows-only (term selection
# involves tf*idf ranking whose float ties are engine-specific)
# ==========================================================================
@gate("mlt_topk", None)
def mlt_topk(spark, sf_dir):
    _, s, _ = get_engine(spark, sf_dir)
    q = more_like_this_query(s.index, doc_id=0, max_query_terms=10, min_term_freq=1, min_doc_freq=2)
    return s.search(q, 10).select("doc_id")


# ==========================================================================
# Sloppy phrase (SloppyPhraseScorer) — rows-only doc set (float freq)
# ==========================================================================
@gate("phrase_sloppy", None)
def phrase_sloppy(spark, sf_dir):
    _, s, _ = get_engine(spark, sf_dir)
    return s.scored(PhraseQuery(terms=("key", "scan"), slop=3)).select("doc_id")


# ==========================================================================
# SimHash — exact integer SQL oracle
# ==========================================================================
_SIMHASH_BITS = 16  # keep the generated SQL readable; engine supports 60


def _simhash_sql() -> str:
    # bit i of h = int(md5hex[0:15], 16): hex digit 14 - i//4, bit i%4
    bit_terms = []
    for i in range(_SIMHASH_BITS):
        digit = f"(strpos('0123456789abcdef', substr(md5(term), {15 - i // 4}, 1)) - 1)"
        bit = f"(({digit} // {1 << (i % 4)}) % 2)"
        bit_terms.append(
            f"CAST(sum(CASE WHEN {bit} = 1 THEN tf ELSE -tf END) > 0 AS BIGINT) * {1 << i}"
        )
    fp = " + ".join(bit_terms)
    return (
        SQL_PRELUDE
        + f"""
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash
FROM post GROUP BY doc_id
"""
    )


@gate("simhash_fingerprint", _simhash_sql())
def simhash_fingerprint(spark, sf_dir):
    """SimHash document fingerprints (near-dup signature): tf-weighted
    sign-sum over md5 term-hash bits — all-integer arithmetic, exact
    cross-engine."""
    idx, _, _ = get_engine(spark, sf_dir)
    return fdedup.simhash64(
        idx.postings.select("doc_id", "term", "tf"), tf_col="tf", n_bits=_SIMHASH_BITS
    )


# ==========================================================================
# LSH ANN — rows-only (hyperplane sign at dot~0 is float-sensitive)
# ==========================================================================
@gate("ann_lsh_topk", None)
def ann_lsh_topk(spark, sf_dir):
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return fsim.ann_lsh_topk(emb, query_vec_id=0, k=10, n_planes=6)
