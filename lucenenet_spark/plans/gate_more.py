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
# MoreLikeThis (Queries/Mlt/MoreLikeThis.cs): term selection ranks on
# QUANTIZED tf*idf (floor(s*1e6+0.5), term tie-break) so the SQL oracle
# reproduces the exact selected term set; doc scores quantized as usual.
# ==========================================================================
@gate(
    "mlt_topk",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, mt AS (
  SELECT p.term
  FROM post p JOIN ts USING (term), cs
  WHERE p.doc_id = 0 AND p.tf >= 1 AND ts.df >= 2
  ORDER BY CAST(floor(p.tf * (ln(cs.n / (ts.df + 1)) + 1) * 1000000 + 0.5) AS BIGINT) DESC,
           p.term ASC
  LIMIT 10
)
SELECT s.doc_id,
       CAST(floor(sum(s.idf * 2.2 * s.tf / (s.tf + s.nrm)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM sc s JOIN mt USING (term)
GROUP BY s.doc_id
ORDER BY score_q DESC, s.doc_id ASC LIMIT 10
""",
)
def mlt_topk(spark, sf_dir):
    """MoreLikeThis: top-10 quantized-tf*idf terms of doc 0 -> OR query ->
    top-10 docs by summed BM25 (Queries/Mlt/MoreLikeThis.cs:129)."""
    _, s, _ = get_engine(spark, sf_dir)
    q = more_like_this_query(s.index, doc_id=0, max_query_terms=10, min_term_freq=1, min_doc_freq=2)
    scored = s.scored(q).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(10)


# ==========================================================================
# Sloppy phrase (SloppyPhraseScorer): EXACT integer oracle. The reference's
# PhraseFreq walk for a 2-term non-repeating phrase reduces to a ZIGZAG
# CHAIN over the shifted position lists A, B:
#   q1    = the larger of (min A, min B), ties -> B's (the lower-offset pp
#           pops first);
#   q_i+1 = the OTHER list's least element strictly greater than q_i;
#   match i: u_i = the other list's largest element <= q_i,
#            matchLength = q_i - u_i, scored 1/(1+matchLength) if <= slop.
# (Derivation: after each overtake the in-hand pp sits at the previous q
# and its run consumes exactly the elements <= the new q; `end` equals the
# queue head for n=2; exhaustion scores the last chain pair.) Verified
# against the walk on 500 randomized lists and against the reference's own
# TestSloppyPhraseQuery golden cases (tests/test_round2.py). With slop <= 3
# every contribution is in {1, 1/2, 1/3, 1/4}, so freq*60 is an integer
# both engines compute exactly. The chain is a recursive CTE partitioned
# by doc_id.
# ==========================================================================
@gate(
    "phrase_sloppy",
    SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1) + """,
pa AS (SELECT doc_id, pos AS v FROM tok WHERE term = 'key'),
pb AS (SELECT doc_id, pos - 1 AS v FROM tok WHERE term = 'scan'),
firsts AS (
  SELECT a.doc_id, a.m AS fa, b.m AS fb
  FROM (SELECT doc_id, min(v) AS m FROM pa GROUP BY doc_id) a
  JOIN (SELECT doc_id, min(v) AS m FROM pb GROUP BY doc_id) b USING (doc_id)
),
chain(doc_id, q, src) AS (
  SELECT doc_id,
         CASE WHEN fa <= fb THEN fb ELSE fa END,
         CASE WHEN fa <= fb THEN 1 ELSE 0 END
  FROM firsts
  UNION ALL
  SELECT c.doc_id,
         CASE WHEN c.src = 1
              THEN (SELECT min(v) FROM pa WHERE pa.doc_id = c.doc_id AND v > c.q)
              ELSE (SELECT min(v) FROM pb WHERE pb.doc_id = c.doc_id AND v > c.q) END,
         1 - c.src
  FROM chain c
  WHERE (CASE WHEN c.src = 1
              THEN (SELECT min(v) FROM pa WHERE pa.doc_id = c.doc_id AND v > c.q)
              ELSE (SELECT min(v) FROM pb WHERE pb.doc_id = c.doc_id AND v > c.q) END)
        IS NOT NULL
),
pairs AS (
  SELECT doc_id, q,
         CASE WHEN src = 1
              THEN (SELECT max(v) FROM pa WHERE pa.doc_id = chain.doc_id AND v <= q)
              ELSE (SELECT max(v) FROM pb WHERE pb.doc_id = chain.doc_id AND v <= q) END AS u
  FROM chain
)
SELECT doc_id,
       CAST(sum(CASE q - u WHEN 0 THEN 60 WHEN 1 THEN 30 WHEN 2 THEN 20 WHEN 3 THEN 15 END)
            AS BIGINT) AS freq60
FROM pairs WHERE q - u <= 3 GROUP BY doc_id HAVING freq60 > 0
""",
)
def phrase_sloppy(spark, sf_dir):
    """Sloppy phrase "key scan"~3: per-doc sloppyFreq scaled by 60 (the LCM
    of 1..4 denominators) to an exact integer on both sides."""
    _, s, _ = get_engine(spark, sf_dir)
    freqs = s.sloppy_phrase_freqs(PhraseQuery(terms=("key", "scan"), slop=3))
    return freqs.select(
        "doc_id",
        F.floor(F.col("freq") * F.lit(60.0) + F.lit(0.5)).cast("long").alias("freq60"),
    )


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
# LSH ANN: multi-probe (home bucket + all Hamming-1 neighbors), exact
# quantized cosine within the candidate set. The SQL oracle reproduces the
# bucketing with the SAME hyperplane literals (hyperplanes() is a pure
# function of the seed), so candidate sets and the final top-k match.
# ==========================================================================
_ANN_PLANES = 8
_ANN_SEED = 42
_ANN_DIM = 64


def _ann_sql() -> str:
    planes = fsim.hyperplanes(_ANN_PLANES, _ANN_SEED, _ANN_DIM)
    sign_cases = ",\n           ".join(
        "CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(repr(x) for x in plane)
        + "]) >= 0 THEN '1' ELSE '0' END"
        for plane in planes
    )
    hamming = " + ".join(
        f"(CASE WHEN substr(s.bucket, {i + 1}, 1) <> substr(q.qb, {i + 1}, 1) THEN 1 ELSE 0 END)"
        for i in range(_ANN_PLANES)
    )
    return f"""
WITH sig AS (
  SELECT vec_id,
         concat(
           {sign_cases}
         ) AS bucket
  FROM embeddings
),
q AS (SELECT bucket AS qb FROM sig WHERE vec_id = 0),
cand AS (
  SELECT s.vec_id FROM sig s, q WHERE ({hamming}) <= 1
),
e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings JOIN cand USING (vec_id)
),
qv AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = 0
),
d AS (
  SELECT e.vec_id, sum(e.v * qv.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN qv USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qv)
SELECT d.vec_id,
       CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) AS cos_q
FROM d, qn
ORDER BY cos_q DESC, d.vec_id ASC LIMIT 10
"""


@gate("ann_lsh_topk", _ann_sql())
def ann_lsh_topk(spark, sf_dir):
    """Multi-probe hyperplane-LSH ANN: probe home + Hamming-1 buckets,
    exact quantized cosine within candidates (IVF-style two-stage)."""
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return fsim.ann_lsh_topk(
        emb, query_vec_id=0, k=10,
        n_planes=_ANN_PLANES, seed=_ANN_SEED, dim=_ANN_DIM,
        n_probes=2, quantized=True,
    )
