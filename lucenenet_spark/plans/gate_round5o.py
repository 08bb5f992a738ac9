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
# AnalyzingQueryParser (QueryParser/Analyzing/AnalyzingQueryParser.cs):
# 'Merge*' parses to PrefixQuery('merg') against the Porter-stemmed index
# — the classic parser's lowercase-only 'merge*' would miss every doc
# whose surface 'merge/merges/merged/merging' stemmed to 'merg'.
# ==========================================================================
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
