"""Gate registry part 5o: SimHash banded near-duplicate pairs (the
Manku WWW'07 detector over the existing fingerprints) and the
AnalyzingQueryParser front-end (analyzed wildcard/prefix/fuzzy terms).

The simhash_near_dup oracle is deliberately the BRUTE-FORCE all-pairs
Hamming join: the engine's band equi-join is a pure performance device
(pigeonhole: hamming <= 3 over 4 bands guarantees one exact band), so
matching the brute-force answer proves the banding loses no pair —
the same adversarial-oracle shape as geo_cell_join.
"""

from __future__ import annotations

from lucenenet_spark.functions import dedup as fdedup
from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine
from lucenenet_spark.plans.gate_modules import _stem_case, get_engine_stemmed

# ==========================================================================
# SimHash near-duplicate pairs (Manku/Jain/Das Sarma WWW'07 §3).
# 16-bit fingerprints keep the generated SQL readable (engine supports 60);
# 4 bands x 4 bits, max hamming 3 — exactly the pigeonhole bound.
# ==========================================================================
_NB = 16


def _fp_expr() -> str:
    # bit i of h = int(md5hex[0:15], 16): hex digit 14 - i//4, bit i%4 —
    # identical construction to gate_more._simhash_sql (simhash_fingerprint)
    bit_terms = []
    for i in range(_NB):
        digit = f"(strpos('0123456789abcdef', substr(md5(term), {15 - i // 4}, 1)) - 1)"
        bit = f"(({digit} // {1 << (i % 4)}) % 2)"
        bit_terms.append(
            f"CAST(sum(CASE WHEN {bit} = 1 THEN tf ELSE -tf END) > 0 AS BIGINT) * {1 << i}"
        )
    return " + ".join(bit_terms)


@gate(
    "simhash_near_dup",
    SQL_PRELUDE
    + f""",
fp AS (SELECT doc_id, CAST({_fp_expr()} AS BIGINT) AS simhash FROM post GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
)
def simhash_near_dup(spark, sf_dir):
    """Near-duplicate pairs within Hamming distance 3 of the tf-weighted
    SimHash — banded equi-join in the engine, brute-force in the oracle."""
    idx, _, _ = get_engine(spark, sf_dir)
    return fdedup.simhash_near_duplicates(
        idx.postings.select("doc_id", "term", "tf"),
        n_bits=_NB,
        n_bands=4,
        max_hamming=3,
        max_bucket_size=None,  # oracle has no cap; production default caps
    )


# ==========================================================================
# WikipediaTokenizer typed tokens (Analysis/Wikipedia/WikipediaTokenizer.cs
# :39-49): deterministic wiki markup is CONSTRUCTED from each doc's first
# three words — "== w3 ==\n[[w1]] [[Category:w2]] plain" — then the real
# tokenizer emits (term, type, pos) in reading order; the gate keeps the
# typed (markup) tokens. The oracle rebuilds the same three rows directly:
# heading token at pos 0, internal-link target at 1, category at 2 (the
# trailing plain alphanumeric consumes pos 3 but has no type).
# ==========================================================================
@gate(
    "wiki_typed_tokens",
    """
WITH w AS (
  SELECT doc_id,
         lower(string_split(text, ' ')[1]) AS w1,
         lower(string_split(text, ' ')[2]) AS w2,
         lower(string_split(text, ' ')[3]) AS w3
  FROM documents WHERE len(string_split(text, ' ')) >= 3
)
SELECT doc_id, w3 AS term, 'h' AS type, 0 AS pos FROM w
UNION ALL SELECT doc_id, w1, 'il', 1 FROM w
UNION ALL SELECT doc_id, w2, 'c', 2 FROM w
""",
)
def wiki_typed_tokens_gate(spark, sf_dir):
    """Markup classes as token types over constructed wiki text."""
    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.wikipedia import wiki_typed_tokens

    docs = _docs_table(spark, sf_dir)
    w = docs.select("doc_id", F.split("text", " ").alias("ws")).filter(F.size("ws") >= 3)
    markup = F.concat(
        F.lit("== "), F.col("ws")[2], F.lit(" ==\n[["), F.col("ws")[0],
        F.lit("]] [[Category:"), F.col("ws")[1], F.lit("]] plain"),
    )
    toks = wiki_typed_tokens(w.select("doc_id", markup.alias("text")))
    return toks.filter(F.col("type") != "").select("doc_id", "term", "type", "pos")


# ==========================================================================
# AnalyzingQueryParser (QueryParser/Analyzing/AnalyzingQueryParser.cs):
# 'Merge*' parses to PrefixQuery('merg') against the Porter-stemmed index
# — the classic parser's lowercase-only 'merge*' would miss every doc
# whose surface 'merge/merges/merged/merging' stemmed to 'merg'.
# ==========================================================================
# ==========================================================================
# End-to-end near-dedup: the DEDUPLICATED CORPUS view (RefinedWeb §3.2 /
# SlimPajama keep-one-per-cluster) — MinHash-LSH pairs -> connected
# components -> one left-anti join keeping the min-id representative per
# component plus every unpaired doc. Oracle: the dedup_components
# recursive-CTE resolution with the anti-join expressed as NOT IN.
# ==========================================================================
from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRELUDE
from lucenenet_spark.plans.gate import _docs_table
from lucenenet_spark.plans.gate_pipeline import (
    _MAX_BUCKET,
    _MINHASH_BANDS,
    _MINHASH_N,
    _SHINGLE_DF_CAP,
    _lsh_sql_ctes,
)

_SURVIVORS_SQL = (
    _PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1)
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
),
comp AS (
  SELECT node, CAST(least(node, min(r)) AS BIGINT) AS component
  FROM reach GROUP BY node
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
"""
)


@gate("near_dedup_survivors", _SURVIVORS_SQL)
def near_dedup_survivors(spark, sf_dir):
    """documents minus non-canonical near-dup cluster members."""
    docs = _docs_table(spark, sf_dir)
    sh = fdedup.capped_shingles(docs, n=3, df_cap=_SHINGLE_DF_CAP)
    pairs = fdedup.minhash_lsh_pairs(
        sh.withColumnRenamed("shingle", "term"),
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        max_bucket_size=_MAX_BUCKET,
    )
    return fdedup.near_duplicate_survivors(docs, pairs).select("doc_id")


@gate(
    "analyzing_parser_prefix",
    SQL_PRELUDE
    + f""",
tokst AS (SELECT doc_id, {_stem_case()} AS term, pos FROM tokf),
post2 AS (SELECT doc_id, term FROM tokst GROUP BY doc_id, term)
SELECT DISTINCT doc_id FROM post2 WHERE term LIKE 'merg%'
""",
)
def analyzing_parser_prefix(spark, sf_dir):
    """Prefix body analyzed through the index's EnglishAnalyzer
    (AnalyzeSingleChunk), then expanded on the stemmed vocabulary."""
    from lucenenet_spark.queryparser.analyzing import AnalyzingQueryParser

    _, s = get_engine_stemmed(spark, sf_dir)
    q = AnalyzingQueryParser(analyzer=s.index.analyzer).parse("Merge*")
    return s.docset(q)
