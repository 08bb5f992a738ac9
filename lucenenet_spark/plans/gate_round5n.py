"""Gate registry part 5n: LLM-pipeline mixture + packing ops —
temperature (alpha) source re-weighting and concat-then-chunk sequence
packing, both beyond-reference training-data operators over the
documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import gate, get_engine


# ==========================================================================
# Temperature mixture re-weighting (p_i ∝ c_i^alpha, the multilingual
# pretraining sampler): per-lang tempered probability and expected
# per-doc repeat factor at alpha = 0.5. Metadata-sized aggregate; the
# oracle reproduces the arithmetic term-for-term (left-assoc w/z *
# n_total / n_docs) so the 1e6 quantization hashes equal.
# ==========================================================================
@gate(
    "temperature_mixture",
    """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
p AS (SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE), 0.5) AS w FROM c),
z AS (SELECT sum(w) AS z, CAST(sum(n_docs) AS DOUBLE) AS n_total FROM p)
SELECT p.lang, p.n_docs,
       CAST(floor(p.w / z.z * 1000000 + 0.5) AS BIGINT) AS p_q,
       CAST(floor(p.w / z.z * z.n_total / p.n_docs * 1000000 + 0.5) AS BIGINT) AS repeat_q
FROM p, z
""",
)
def temperature_mixture(spark, sf_dir):
    from lucenenet_spark.functions.sampling import temperature_weights

    _idx, _s, docs = get_engine(spark, sf_dir)
    w = temperature_weights(docs, "lang", alpha=0.5)
    q = lambda c: F.floor(F.col(c) * 1000000 + F.lit(0.5)).cast("long")  # noqa: E731
    return w.select(
        "lang", "n_docs", q("p").alias("p_q"), q("repeat_factor").alias("repeat_q")
    )


# ==========================================================================
# Concat-then-chunk sequence packing (GPT/LLaMA pretraining layout):
# per-doc packing coordinates — shard (doc_id % 8), token offset in the
# shard's packed stream, first/last 512-token chunk touched. The offsets
# are a per-shard window cumsum in doc-id order, deterministic under any
# partitioning.
# ==========================================================================
@gate(
    "pack_sequences",
    """
WITH b AS (
  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
o AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
              - n_tokens AS BIGINT) AS tok_offset
  FROM b
)
SELECT doc_id, shard, n_tokens, tok_offset,
       tok_offset // 512 AS chunk_first,
       (tok_offset + n_tokens - 1) // 512 AS chunk_last,
       (tok_offset + n_tokens - 1) // 512 - tok_offset // 512 + 1 AS chunks_spanned
FROM o
""",
)
def pack_sequences_gate(spark, sf_dir):
    from lucenenet_spark.functions.packing import pack_sequences

    _idx, _s, docs = get_engine(spark, sf_dir)
    return pack_sequences(docs, capacity=512, n_shards=8).withColumnRenamed(
        "offset", "tok_offset"
    )


# ==========================================================================
# C4 web-page cleaning (Raffel et al. 2020 §2.2): line structure is
# synthesized deterministically (' window' -> '.' + newline), with
# 'lorem ipsum' planted on doc_id % 97 == 0 and a curly brace on
# % 89 == 0. Per-doc counters + the page keep/drop decision.
# ==========================================================================
@gate(
    "c4_clean_filter",
    """
WITH t AS (
  SELECT doc_id,
         replace(text, ' window', '.' || chr(10))
           || CASE WHEN doc_id % 97 = 0 THEN ' lorem ipsum' ELSE '' END
           || CASE WHEN doc_id % 89 = 0 THEN '{' ELSE '' END AS text
  FROM documents
),
k AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(
           string_split(text, chr(10)),
           ln -> substr(ln, -1, 1) IN ('.', '!', '?', '"')
                 AND len(string_split(ln, ' ')) >= 5
         ) AS kept
  FROM t
),
s AS (
  SELECT doc_id, text, lines, kept,
         -- array_to_string([]) is NULL in DuckDB; Spark array_join gives ''
         coalesce(array_to_string(kept, chr(10)), '') AS kt
  FROM k
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(length(kt) - length(replace(replace(replace(replace(kt,
            '.', ''), '!', ''), '?', ''), '"', '')) AS BIGINT) AS n_sentences,
       (length(kt) - length(replace(replace(replace(replace(kt,
            '.', ''), '!', ''), '?', ''), '"', '')) >= 3
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{')) AS kept
FROM s
""",
)
def c4_clean_filter_gate(spark, sf_dir):
    from lucenenet_spark.functions.c4 import c4_clean_stats

    _idx, _s, docs = get_engine(spark, sf_dir)
    synth = docs.select(
        "doc_id",
        F.concat(
            F.replace(F.col("text"), F.lit(" window"), F.lit(".\n")),
            F.when(F.col("doc_id") % 97 == 0, F.lit(" lorem ipsum")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 89 == 0, F.lit("{")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return c4_clean_stats(synth)


# ==========================================================================
# Locale range query over collation keys — CollationKeyAnalyzer's
# documented use-case (CollationKeyAnalyzer.cs "for use with
# TermRangeQuery"; TermRangeQuery.cs include bounds): titles in
# [Äpfel, Österreich) under DIN 5007-2 — aepfel/apfelbaum/mueller/oel
# in, oesterreich/strasse/ueber/zebra out.
# ==========================================================================
@gate(
    "collated_range_query",
    """
WITH t AS (
  SELECT doc_id,
         (['Müller', 'mueller', 'Äpfel', 'apfelbaum', 'Österreich',
           'oel', 'über', 'zebra', 'Straße', 'strasse'])
           [CAST(doc_id % 10 AS INTEGER) + 1] AS title
  FROM documents
),
k AS (
  SELECT doc_id, title,
         replace(replace(replace(replace(lower(title),
             'ä', 'ae'), 'ö', 'oe'), 'ü', 'ue'), 'ß', 'ss') AS ckey
  FROM t
)
SELECT doc_id, title FROM k
WHERE ckey >= 'aepfel' AND ckey < 'oesterreich'
""",
)
def collated_range_query(spark, sf_dir):
    from lucenenet_spark.analysis.collation import collated_term_range
    from lucenenet_spark.plans.gate_round5m import _COLLATION_WORDS

    _idx, _s, docs = get_engine(spark, sf_dir)
    words = F.array(*[F.lit(w) for w in _COLLATION_WORDS])
    titled = docs.select(
        "doc_id", F.element_at(words, (F.col("doc_id") % 10 + 1).cast("int")).alias("title")
    )
    return collated_term_range(titled, "title", "Äpfel", "Österreich")


# ==========================================================================
# FieldValueFilter (Search/FieldValueFilter.cs:33): docs that HAVE a
# value for a docvalues field (docsWithField bits ≙ column NULL-ness).
# Nulls are planted deterministically (source 'src3' -> NULL); the gate
# returns the positive-filter survivors.
# ==========================================================================
@gate(
    "field_value_filter",
    """
SELECT doc_id, source AS value FROM documents WHERE source <> 'src3'
""",
)
def field_value_filter_gate(spark, sf_dir):
    from lucenenet_spark.search.filters import field_value_filter

    _idx, _s, docs = get_engine(spark, sf_dir)
    with_nulls = docs.select(
        "doc_id", F.nullif(F.col("source"), F.lit("src3")).alias("value")
    )
    return field_value_filter(with_nulls, "value")


# ==========================================================================
# Deterministic corpus shuffle (training-order randomization): global
# ORDER BY md5('shuffle#'||id) — rerun- and partitioning-stable. First
# 50 docs of the permutation with their shuffle keys.
# ==========================================================================
from lucenenet_spark.plans.gate_round5d import _hex8_of  # noqa: E402


@gate(
    "deterministic_shuffle",
    f"""
SELECT doc_id,
       CAST({_hex8_of("concat('shuffle#', CAST(doc_id AS VARCHAR))")} AS BIGINT)
         AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id LIMIT 50
""",
)
def deterministic_shuffle_gate(spark, sf_dir):
    from lucenenet_spark.functions.sampling import deterministic_shuffle

    _idx, _s, docs = get_engine(spark, sf_dir)
    return deterministic_shuffle(docs.select("doc_id")).limit(50)


# ==========================================================================
# Distributed radius join (RecursivePrefixTreeStrategy's grid+verify as
# a cell equi-join; search/spatial.py geo_cell_join): left probes are
# the doc_id % 5 == 0 points, right is the full point set, radius
# 300 km. The ORACLE is the brute-force all-pairs join — so the gate
# proves the cell cover misses nothing. Output: per-probe neighbor
# count (every probe >= 1: itself).
# ==========================================================================
from lucenenet_spark.plans.gate_round5 import _GEO_POINTS, _geo_df  # noqa: E402


@gate(
    "geo_cell_join",
    "WITH " + _GEO_POINTS + """
, l AS (SELECT * FROM geo WHERE doc_id % 5 = 0)
SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_within
FROM l JOIN geo r
  ON 2.0 * 6371.0088 * asin(sqrt(
       sin(radians(r.lat - l.lat) / 2) * sin(radians(r.lat - l.lat) / 2)
       + cos(radians(l.lat)) * cos(radians(r.lat))
         * sin(radians(r.lon - l.lon) / 2) * sin(radians(r.lon - l.lon) / 2)
     )) <= 300.0
GROUP BY l.doc_id
""",
)
def geo_cell_join_gate(spark, sf_dir):
    from lucenenet_spark.search.spatial import geo_cell_join

    geo = _geo_df(spark, sf_dir)
    left = geo.filter(F.col("doc_id") % 5 == 0)
    pairs = geo_cell_join(left, geo, 300.0)
    return pairs.groupBy(F.col("left_id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_within")
    )


# ==========================================================================
# TermDistinctValuesCollector (Grouping/Term/TermDistinctValuesCollector.cs):
# docs matching TermQuery('merge'), grouped by source, with the distinct
# langs per group (count + sorted comma-joined values).
# ==========================================================================
from lucenenet_spark.plans.gate import SQL_PRELUDE  # noqa: E402
from lucenenet_spark.search.queries import TermQuery  # noqa: E402


@gate(
    "group_distinct_values",
    SQL_PRELUDE + """
, m AS (SELECT DISTINCT doc_id FROM post WHERE term = 'merge')
SELECT d.source,
       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_distinct,
       array_to_string(list_sort(list(DISTINCT d.lang)), ',') AS values
FROM m JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def group_distinct_values_gate(spark, sf_dir):
    from lucenenet_spark.search.collectors import group_distinct_values

    _idx, s, docs = get_engine(spark, sf_dir)
    matches = s.docset(TermQuery("merge")).join(
        docs.select("doc_id", "source", "lang"), "doc_id"
    )
    return group_distinct_values(matches, "source", "lang")


# ==========================================================================
# SearcherLifetimeManager (Search/SearcherLifetimeManager.cs Record/
# Acquire): batch 0 (even doc_ids) commits, the generation is recorded,
# batch 1 (odd doc_ids) commits — and the ACQUIRED searcher still
# answers as-of the record point: TermQuery('merge') docs restricted to
# even ids, while the refreshed searcher sees everything.
# ==========================================================================
_LIFETIME_CACHE: dict[str, object] = {}


@gate(
    "searcher_lifetime",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE term = 'merge' AND doc_id % 2 = 0
""",
)
def searcher_lifetime(spark, sf_dir):
    import os as _os
    import tempfile

    from lucenenet_spark.streaming.incremental import IncrementalIndexer

    key = _os.path.abspath(sf_dir)
    if key not in _LIFETIME_CACHE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        ix = IncrementalIndexer(tempfile.mkdtemp(prefix="lifetime_gate_"))
        ix.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
        token = ix.record()
        ix.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
        _LIFETIME_CACHE[key] = (ix, token)
    ix, token = _LIFETIME_CACHE[key]
    pinned = ix.acquire(spark, token)
    return pinned.docset(TermQuery("merge")).select("doc_id")


# ==========================================================================
# AnalyzingInfixSuggester with CONTEXTS (AnalyzingInfixSuggester.cs
# Lookup(key, contexts, ...)): the 'key' infix lookup of the
# infix_suggest gate, restricted to suggestions whose first-2-token
# surface occurs in at least one GERMAN document — one left-semi join
# against the (surface, context) table.
# ==========================================================================
from lucenenet_spark.plans.gate import _STOPS  # noqa: E402


@gate(
    "context_infix_suggest",
    """
WITH ent AS (
  SELECT surface, lang, CAST(count(*) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface, lang
    FROM documents
  ) GROUP BY surface, lang
),
agg AS (SELECT surface, CAST(sum(weight) AS BIGINT) AS weight FROM ent GROUP BY surface),
an AS (
  SELECT surface, weight,
         list_filter(string_split(lower(surface), ' '),
                     x -> x <> '' AND x NOT IN (""" + _STOPS + """)) AS toks
  FROM agg
),
de AS (SELECT DISTINCT surface FROM ent WHERE lang = 'de')
SELECT surface, weight FROM an JOIN de USING (surface)
WHERE len(list_filter(toks, x -> x LIKE 'key%')) > 0
ORDER BY weight DESC, surface ASC
LIMIT 5
""",
)
def context_infix_suggest(spark, sf_dir):
    from lucenenet_spark.search.suggest import AnalyzingInfixSuggester

    _idx, _s, docs = get_engine(spark, sf_dir)
    first2 = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("surface")
    ent = (
        docs.select(first2)
        .groupBy("surface")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    ctx = docs.select(first2, F.col("lang").alias("context")).distinct()
    sug = AnalyzingInfixSuggester(ent, contexts_df=ctx)
    return sug.lookup("key", 5, contexts={"de"})
