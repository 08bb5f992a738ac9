"""Gate registry part 5g (bonus session): the remaining portable
query-layer seams — the full MultiTermQuery rewrite-strategy set
(Search/TopTermsRewrite.cs, ScoringRewrite.cs,
ConstantScoreAutoRewrite.cs), SpanMultiTermQueryWrapper inside a
span-near (Search/Spans/SpanMultiTermQueryWrapper.cs), the
payload-checked spans (Search/Spans/Span{Near,}PayloadCheckQuery.cs),
CachingCollector replay (Search/CachingCollector.cs),
ToChildBlockJoinQuery (Join/ToChildBlockJoinQuery.cs), and the
AllGroupHeads/AllGroups collectors (Grouping/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _spark_score_q,
    gate,
    get_engine,
)

# ==========================================================================
# TopTermsRewrite: bounded expansion of a MultiTermQuery into a SHOULD
# BooleanQuery, at most `size` terms kept. At constant boost (every
# non-fuzzy MultiTermQuery) ScoreTerm.CompareTo's reversed bytes
# comparison (TopTermsRewrite.cs:272-283) keeps the `size`
# lexicographically smallest matching terms; the kept set is then scored
# exactly like a hand-written OR (TopTermsScoringBooleanQueryRewrite).
# Prefix 's' matches {scan, slow, small, sort, spark, stream} on this
# vocabulary; size=4 keeps scan/slow/small/sort.
# ==========================================================================
_TOP_TERMS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + """
, kept AS (
  SELECT term FROM ts WHERE term LIKE 's%' ORDER BY term ASC LIMIT 4
)
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score
  FROM sc JOIN kept USING (term)
)
GROUP BY doc_id
"""


@gate("top_terms_prefix", _TOP_TERMS_SQL)
def top_terms_prefix(spark, sf_dir):
    """PrefixQuery('s') under TOP_TERMS(4) rewrite: the pattern predicate
    is pushed to the term-stats scan, the driver materializes only the
    4-term kept set (the reference's priority-queue bound), and the
    rewritten BooleanQuery scores as a single-scan disjunction."""
    from lucenenet_spark.search.queries import PrefixQuery

    _, s, _ = get_engine(spark, sf_dir)
    bq = s.rewrite_top_terms(PrefixQuery("s"), size=4)
    return _spark_score_q(s.scored(bq))


# ==========================================================================
# SpanMultiTermQueryWrapper: a span-near whose second clause is a
# PrefixQuery — the slot's positions are the union of every dictionary
# term matching the pattern, compiled to a predicate on the postings scan
# (Search/Spans/SpanMultiTermQueryWrapper.cs; execution shape shared with
# the ComplexPhrase parser via span_near_pattern_docs).
# ==========================================================================
_SPAN_WRAPPER_SQL = SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tokf a JOIN tokf b
  ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 3
WHERE a.term = 'key' AND b.term LIKE 's%'
"""


@gate("span_wrapper_near", _SPAN_WRAPPER_SQL)
def span_wrapper_near(spark, sf_dir):
    """SpanNearQuery(ordered, slop=3) of ('key', wrapper(PrefixQuery('s')))."""
    from lucenenet_spark.search.queries import PrefixQuery
    from lucenenet_spark.search.spans import span_near_pattern_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return span_near_pattern_docs(idx, ["key", PrefixQuery("s")], slop=3, in_order=True)


# ==========================================================================
# SpanNearPayloadCheckQuery over the pos%3+1-payloaded corpus (the same
# DelimitedPayloadAnalyzer build as payload_term/payload_near): ordered
# near('key','agg', slop=2) accepted only when both collected payloads are
# in the required set {2,1} — AcceptPosition's order-insensitive
# compare-all loop (SpanNearPayloadCheckQuery.cs:58-88).
# ==========================================================================
_PAYLOAD_CHECK_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokp AS (
  SELECT doc_id, term, pos, CAST((pos % 3) + 1 AS DOUBLE) AS payload
  FROM tok WHERE term <> ''
)
SELECT DISTINCT a.doc_id
FROM tokp a JOIN tokp b
  ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
WHERE a.term = 'key' AND b.term = 'agg'
  AND a.payload IN (2.0, 1.0) AND b.payload IN (2.0, 1.0)
"""


@gate("span_payload_check", _PAYLOAD_CHECK_SQL)
def span_payload_check(spark, sf_dir):
    """span_near_payload_check_docs(['key','agg'], required=[2,1], slop=2)."""
    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.spans import span_near_payload_check_docs

    _, _, docs = get_engine(spark, sf_dir)
    payload_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda x, i: F.concat(
                x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
            ),
        ),
        " ",
    )
    fused = docs.select("doc_id", payload_text.alias("text"))
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    return span_near_payload_check_docs(
        idx, ["key", "agg"], payloads_to_match=[2.0, 1.0], slop=2
    )


# ==========================================================================
# ScoringRewrite: SCORING_BOOLEAN_QUERY_REWRITE (Search/ScoringRewrite.cs:
# 36-75) as a fully-distributed scored pattern disjunction — every 's%'
# dictionary term scored and summed per doc, the expansion never
# materialized on the driver (Lucene must cap this rewrite at
# MaxClauseCount=1024; here it is unbounded).
# ==========================================================================
_SCORING_REWRITE_SQL = SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score
  FROM sc WHERE term LIKE 's%'
)
GROUP BY doc_id
"""


@gate("scoring_rewrite_prefix", _SCORING_REWRITE_SQL)
def scoring_rewrite_prefix(spark, sf_dir):
    """PrefixQuery('s') under SCORING_BOOLEAN_QUERY_REWRITE."""
    from lucenenet_spark.search.queries import PrefixQuery

    _, s, _ = get_engine(spark, sf_dir)
    return _spark_score_q(s.scored_scoring_rewrite(PrefixQuery("s")))


# ==========================================================================
# ConstantScoreAutoRewrite: both branches constant-score; at the default
# cutoffs (350 terms / 0.1% of maxDoc) the 's%' expansion's docVisitCount
# trips the doc cutoff, so this takes the CONSTANT_SCORE_FILTER branch —
# the pattern predicate straight on the postings scan.
# ==========================================================================
_AUTO_REWRITE_SQL = SQL_PRELUDE + """
SELECT DISTINCT doc_id, CAST(10000 AS BIGINT) AS score_q
FROM post WHERE term LIKE 's%'
"""


@gate("auto_rewrite_prefix", _AUTO_REWRITE_SQL)
def auto_rewrite_prefix(spark, sf_dir):
    """PrefixQuery('s') under CONSTANT_SCORE_AUTO_REWRITE_DEFAULT."""
    from lucenenet_spark.search.queries import PrefixQuery

    _, s, _ = get_engine(spark, sf_dir)
    return _spark_score_q(s.scored_auto_rewrite(PrefixQuery("s")))


# ==========================================================================
# CachingCollector (Search/CachingCollector.cs): materialize one query's
# docset, replay it into a downstream collector without re-running the
# query — here a lang facet count over the cached hits. Drives the
# combinator through the driver gate (it previously had only local
# tests, VERDICT r4 §2.6).
# ==========================================================================
_CACHING_SQL = SQL_PRELUDE + """
SELECT d.lang, CAST(count(*) AS BIGINT) AS cnt
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM post WHERE term = 'vector')
GROUP BY d.lang
"""


@gate("caching_collector_facet", _CACHING_SQL)
def caching_collector_facet(spark, sf_dir):
    """caching_collector(TermQuery('vector')) replayed into a lang facet."""
    from lucenenet_spark.search.collectors import caching_collector
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    # stays persisted until the driver collects the returned plan (the
    # contract is caller-unpersists-when-done; the gate's caller is the
    # driver harness, and the cached docset is a few hundred rows)
    cached = caching_collector(s, TermQuery("vector"))
    return (
        cached.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ==========================================================================
# ToChildBlockJoinQuery (Join/ToChildBlockJoinQuery.cs): children of
# matching parents — the other direction of the block-join family
# (block_join_max/avg cover ToParentBlockJoin). Parent query = urgent
# orders; children = their lineitems.
# ==========================================================================
_TO_CHILD_SQL = """
SELECT l.l_orderkey, l.l_linenumber
FROM lineitem l
WHERE l.l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@gate("block_join_to_child", _TO_CHILD_SQL)
def block_join_to_child(spark, sf_dir):
    """to_child_block_join(urgent orders -> lineitems)."""
    import os

    from lucenenet_spark.search.joins import to_child_block_join

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    parents = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    return to_child_block_join(
        parents, li.select("l_orderkey", "l_linenumber"), "l_orderkey"
    )


# ==========================================================================
# AllGroupHeadsCollector + AllGroupsCollector
# (Grouping/AllGroupHeadsCollector.cs, Grouping/Terms/
# TermAllGroupsCollector.cs): the two Grouping-module collectors without
# gates — head doc per group under the score sort, and the distinct
# matched-group count.
# ==========================================================================
from lucenenet_spark.plans.gate import _Q, _tsc  # noqa: E402

_GROUP_HEADS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f"""
, scored AS ({_tsc('merge')})
SELECT source, doc_id, {_Q} AS score_q FROM (
  SELECT d.source, s.doc_id, s.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN documents d USING (doc_id)
) WHERE rn = 1
"""


@gate("group_heads_query", _GROUP_HEADS_SQL)
def group_heads_query(spark, sf_dir):
    """group_heads(TermQuery('merge'), by source)."""
    from lucenenet_spark.search.collectors import group_heads
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    out = group_heads(s, TermQuery("merge"), docs, "source")
    return out.select(
        "source",
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


_ALL_GROUPS_SQL = SQL_PRELUDE + """
SELECT CAST(count(DISTINCT d.source) AS BIGINT) AS n_groups
FROM post p JOIN documents d USING (doc_id)
WHERE p.term = 'merge'
"""


@gate("all_groups_count", _ALL_GROUPS_SQL)
def all_groups_count_gate(spark, sf_dir):
    """all_groups_count(TermQuery('merge'), by source)."""
    from lucenenet_spark.search.collectors import all_groups_count
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    return all_groups_count(s, TermQuery("merge"), docs, "source").select(
        F.col("n_groups").cast("long").alias("n_groups")
    )


# ==========================================================================
# SpanPayloadCheckQuery, single clause (Search/Spans/SpanPayloadCheckQuery
# .cs) — distinct from the near variant above: one payload collected at
# one matched position, compared to one required payload; composed with
# the SpanFirstQuery position limit (match within the first 5 positions).
# pos%3+1 == 1 admits positions {0, 3} only.
# ==========================================================================
_PAYLOAD_CHECK_TERM_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokp AS (
  SELECT doc_id, term, pos, CAST((pos % 3) + 1 AS DOUBLE) AS payload
  FROM tok WHERE term <> ''
)
SELECT DISTINCT doc_id
FROM tokp WHERE term = 'table' AND pos < 5 AND payload = 1.0
"""


@gate("payload_check_first", _PAYLOAD_CHECK_TERM_SQL)
def payload_check_first(spark, sf_dir):
    """SpanPayloadCheck(SpanFirst('table', 5), payload=1)."""
    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.spans import span_payload_check_term_docs

    _, _, docs = get_engine(spark, sf_dir)
    payload_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda x, i: F.concat(
                x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
            ),
        ),
        " ",
    )
    fused = docs.select("doc_id", payload_text.alias("text"))
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    return span_payload_check_term_docs(idx, "table", 1.0, end=5)


# ==========================================================================
# Explain API (IndexSearcher.Explain -> BM25Similarity.ExplainScore,
# Similarities/BM25Similarity.cs:338-371): the Explanation tree's numeric
# leaves — freq, fieldLength, idf, tfNorm, final score — reproduced per
# matching doc; the oracle recomputes every leaf from the shared prelude.
# ==========================================================================
_EXPLAIN_SQL = SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id,
       tf AS freq,
       dl AS field_length,
       CAST(floor(idf * 10000 + 0.5) AS BIGINT) AS idf_q,
       CAST(floor((2.2 * tf / (tf + nrm)) * 10000 + 0.5) AS BIGINT) AS tfnorm_q,
       CAST(floor((idf * 2.2 * tf / (tf + nrm)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM sc WHERE term = 'vector'
"""


@gate("explain_term", _EXPLAIN_SQL)
def explain_term(spark, sf_dir):
    """explain_term(TermQuery('vector')): per-doc Explanation leaves."""
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    out = s.explain_term(TermQuery("vector"))
    q10k = lambda c: F.floor(F.col(c) * F.lit(10000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    return out.select(
        "doc_id",
        F.col("freq").cast("long"),
        F.col("field_length").cast("long"),
        q10k("idf").alias("idf_q"),
        q10k("tf_norm").alias("tfnorm_q"),
        q10k("score").alias("score_q"),
    )


# ==========================================================================
# Dedup GROUP resolution: connected components over the MinHash-LSH
# candidate pairs (component id = min doc_id). Pair lists alone are
# order-dependent on chains; one-representative-per-component is the
# production near-dup shape (RefinedWeb/SlimPajama). The oracle reuses
# the exact LSH pair CTEs of dedup_minhash_lsh and resolves components
# with a recursive reachability CTE.
# ==========================================================================
from lucenenet_spark.plans.gate_pipeline import (  # noqa: E402
    _MAX_BUCKET,
    _MINHASH_BANDS,
    _MINHASH_N,
    _SHINGLE_DF_CAP,
    _lsh_sql_ctes,
)
from lucenenet_spark.plans.gate import _docs_table  # noqa: E402

_COMPONENTS_SQL = (
    SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + _lsh_sql_ctes()
    + """,
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION
  SELECT doc_b, doc_a FROM cand
),
reach(node, r) AS (
  SELECT a, b FROM edges
  UNION
  SELECT e.a, r.r FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node, CAST(least(node, min(r)) AS BIGINT) AS component
FROM reach GROUP BY node
"""
)


@gate("dedup_components", _COMPONENTS_SQL)
def dedup_components(spark, sf_dir):
    """connected_components(minhash_lsh_pairs(...)): (node, component)."""
    from lucenenet_spark.functions import dedup as fdedup

    sh = fdedup.capped_shingles(
        _docs_table(spark, sf_dir), n=3, df_cap=_SHINGLE_DF_CAP
    )
    pairs = fdedup.minhash_lsh_pairs(
        sh.withColumnRenamed("shingle", "term"),
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        max_bucket_size=_MAX_BUCKET,
    )
    return fdedup.connected_components(pairs)
