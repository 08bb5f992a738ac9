"""Driver-entry contract invariants (no Spark session needed).

The driver records only the FIRST 50 ``queries()`` entries into each
round's CORRECTNESS file, so the window ordering is load-bearing: these
tests freeze it (round 5 final hand-ranked ordering) so an accidental
import-order or priority-list edit cannot silently rotate a
never-verified gate out of — or a duplicate into — the graded slots.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

# the exact 50 names the round-5 driver window must grade, in order:
# 7 never-driver-verified gates, the r5 headliners, the language-pack
# spread, the LLM-pipeline ops, then the 10-gate core canary (41-50)
WINDOW_50 = [
    "common_grams_phrase", "ngram_phrase_query", "nrt_topk",
    "multi_passage_highlight", "compound_word_query",
    "snowball3_term_query", "cjk_bigram_query", "ja_analysis",
    "payload_term", "trec_quality", "geo_bbox", "geo_distance_topk",
    "astral_term_query", "add_indexes_term", "docvalues_update_sort",
    "leading_wildcard_query", "xml_parser_query", "expression_sort",
    "expression_rescore", "slow_fuzzy_query", "terms_filter",
    "icu_folding_term", "phonetic_term_query", "get_term_info",
    "function_recip_scale", "russian_term_query", "turkish_term_query",
    "thai_term_query", "hunspell_term_query", "classic_analysis",
    "word_delimiter_phrase", "dedup_embedding_cosine", "pii_scrub",
    "gopher_repetition", "url_canonical_dedup", "line_dedup_strip",
    "html_extract_roundtrip", "lm_unigram_quality", "decontam_overlap",
    "stratified_sample",
    # core canary, slots 41-50
    "term_query_topk", "boolean_or", "boolean_and", "phrase_query",
    "dedup_minhash_lsh", "search_after", "ann_ivf_topk",
    "sort_by_field", "group_topk", "facet_lang",
]


def test_window_50_is_frozen():
    names = list(entry.queries().keys())[:50]
    assert names == WINDOW_50


def test_every_query_has_a_full_duckdb_oracle():
    q, o = entry.queries(), entry.oracle_sql()
    missing = sorted(set(q) - set(o))
    assert not missing, f"rows-only gates appeared: {missing}"
    extra = sorted(set(o) - set(q))
    assert not extra, f"oracles without queries: {extra}"


def test_registry_has_no_duplicate_slots_and_expected_size():
    names = list(entry.queries().keys())
    assert len(names) == len(set(names))
    assert len(names) >= 228  # grows only; shrinking loses graded rows


def test_oracles_are_nonempty_sql():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
