"""Gate registry part 5l: the SortedSetSelector middle selectors
(src/Lucene.Net.Sandbox/Queries/SortedSetSortField.cs MIDDLE_MIN/
MIDDLE_MAX), JoinDocFreqValueSource
(src/Lucene.Net.Queries/Function/ValueSources/JoinDocFreqValueSource.cs),
and cross-document duplicated-span detection (ExactSubstr-style, Lee et
al. 2022) over the documents table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine


# ==========================================================================
# SortedSetSortField with the MIDDLE_MIN selector: each customer's
# multivalued "field" is the distinct set of their orders' priorities
# (5 distinct values -> sets of size 1-5); customers are ordered by the
# middle value of the sorted set (0-based ord (count-1)/2, the lower
# middle on even counts — SortedSetSelector.cs). Sort key DESC, key
# tie-broken by custkey, so the row set is a total order.
# ==========================================================================
@gate(
    "sorted_set_middle",
    """
WITH s AS (
  SELECT o_custkey AS ckey, list_sort(list(DISTINCT o_orderpriority)) AS vals
  FROM orders GROUP BY o_custkey
)
SELECT ckey, vals[CAST((len(vals) - 1) // 2 AS INTEGER) + 1] AS sort_key
FROM s ORDER BY sort_key DESC, ckey ASC LIMIT 20
""",
)
def sorted_set_middle(spark, sf_dir):
    """One partial-aggregated collect_set per customer (bounded by the 5
    distinct priorities), middle pick as an element_at Column, then
    TakeOrdered — no global sort of the docset."""
    from lucenenet_spark.search.sandbox import sorted_set_sort_field

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    dv = orders.select(F.col("o_custkey").alias("ckey"), "o_orderpriority")
    return sorted_set_sort_field(
        dv, value_col="o_orderpriority", id_col="ckey", selector="middle_min",
        ascending=False, k=20,
    )


# ==========================================================================
# JoinDocFreqValueSource: per doc, the first text token is read off the
# stored fields and its docFreq in the text dictionary is the value
# (0 when absent — stopwords and empty docs hit the reference's
# SeekExact-miss branch). One left join against term stats, no broadcast
# forced (the dictionary is vocabulary-sized at scale).
# ==========================================================================
@gate(
    "join_doc_freq",
    SQL_PRELUDE + """
, fv AS (SELECT doc_id, string_split(text, ' ')[1] AS v FROM documents)
SELECT fv.doc_id, CAST(coalesce(ts.df, 0) AS BIGINT) AS value
FROM fv LEFT JOIN ts ON ts.term = fv.v
""",
)
def join_doc_freq_gate(spark, sf_dir):
    from lucenenet_spark.search.valuesources import join_doc_freq

    idx, _s, docs = get_engine(spark, sf_dir)
    first_tok = F.element_at(F.split(F.col("text"), " "), 1)
    return join_doc_freq(docs, idx, first_tok).select(
        "doc_id", F.col("value").cast("long").alias("value")
    )


# ==========================================================================
# Cross-document duplicated 8-token spans: per doc, total 8-gram
# positions and how many of them carry a gram that appears in >= 2
# distinct docs. Pure integer outputs; the md5 gram key is shared with
# the oracle. The near/exact duplicate clusters testgen plants in the
# corpus make the dup counts non-trivial.
# ==========================================================================
@gate(
    "crossdoc_span_dedup",
    """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
    FROM t WHERE len(toks) >= 8
  )
),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) > 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY doc_id),
dup AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS c
  FROM g JOIN d USING (h) GROUP BY g.doc_id
)
SELECT dd.doc_id,
       CAST(coalesce(tot.c, 0) AS BIGINT) AS total_ngrams,
       CAST(coalesce(dup.c, 0) AS BIGINT) AS dup_ngrams
FROM documents dd
LEFT JOIN tot USING (doc_id)
LEFT JOIN dup USING (doc_id)
""",
)
def crossdoc_span_dedup(spark, sf_dir):
    from lucenenet_spark.functions.dedup import crossdoc_span_stats

    _idx, _s, docs = get_engine(spark, sf_dir)
    return crossdoc_span_stats(docs, n=8)


# ==========================================================================
# The classic TFIDF partial as a ValueSource composition: TFValueSource
# (sqrt tf) x IDFValueSource (per-reader ln(N/(df+1))+1 scalar) x
# NormValueSource (1/sqrt(dl), double mode) for every doc containing the
# term — IDFValueSource.cs + NormValueSource.cs driven through the DSL.
# Multiplication order matches the SQL's left-assoc a*b*c; quantized 1e4.
# ==========================================================================
@gate(
    "function_norm_idf",
    SQL_PRELUDE + """
SELECT p.doc_id,
       CAST(floor(sqrt(p.tf) * (ln(cs.n / (ts.df + 1)) + 1)
                  * (1.0 / sqrt(dl.dl)) * 1e4 + 0.5) AS BIGINT) AS vq
FROM post p JOIN ts USING (term) JOIN dl USING (doc_id), cs
WHERE p.term = 'vector' AND dl.dl > 0
""",
)
def function_norm_idf(spark, sf_dir):
    from lucenenet_spark.search.valuesources import (
        classic_idf,
        doc_freq,
        norm_source,
        tf_source,
    )

    idx, _s, _docs = get_engine(spark, sf_dir)
    idf = classic_idf(doc_freq(idx, "vector"), idx.max_doc)
    tf = tf_source(idx, "vector")  # (doc_id, tf) with tf = sqrt(termFreq)
    nrm = norm_source(idx)  # (doc_id, value) = 1/sqrt(dl), dl=0 -> 0
    return (
        tf.join(nrm, "doc_id")
        .filter(F.col("value") > 0)
        .select(
            "doc_id",
            F.floor(
                F.col("tf") * F.lit(idf) * F.col("value") * F.lit(1e4) + F.lit(0.5)
            ).cast("long").alias("vq"),
        )
    )


# ==========================================================================
# ExactSubstr removal: rewrite each doc with its cross-doc duplicated
# 8-token spans stripped (the transform composing on crossdoc_span_dedup's
# detection). clean_text is compared byte-for-byte; fully-duplicated docs
# come back as the empty string on both sides.
# ==========================================================================
@gate(
    "strip_dup_spans",
    """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, i, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
    FROM t WHERE len(toks) >= 8
  )
),
d AS (SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) > 1),
cov AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT g.doc_id, unnest(generate_series(g.i, g.i + 7)) AS p
    FROM g JOIN d USING (h)
  )
),
tok AS (
  SELECT doc_id, unnest(toks) AS tk, generate_subscripts(toks, 1) AS p FROM t
),
kept AS (
  SELECT tok.doc_id, tok.tk, tok.p
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
  WHERE cov.p IS NULL
)
SELECT d0.doc_id, coalesce(k.txt, '') AS clean_text
FROM documents d0 LEFT JOIN (
  SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS txt FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
)
def strip_dup_spans(spark, sf_dir):
    from lucenenet_spark.functions.dedup import strip_duplicated_spans

    _idx, _s, docs = get_engine(spark, sf_dir)
    return strip_duplicated_spans(docs, n=8)
