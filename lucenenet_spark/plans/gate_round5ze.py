"""Gate registry round-5 part ze: index-layout accounting — term-dict
front-coding savings and the IndexOptions integer-cost audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# term_dict_prefix_stats — BlockTree prefix-sharing benefit
# (BlockTreeTermsWriter.cs:57-64) measured on the engine's sorted term
# dictionary: raw bytes vs front-coded suffix bytes, exact integers.
# ----------------------------------------------------------------------
_PREFIX_SQL = SQL_PRELUDE + """,
tsorted AS (
  SELECT term, lag(term) OVER (ORDER BY term) AS prev FROM ts
),
lcps AS (
  SELECT term, prev,
         CASE WHEN prev IS NULL THEN 0
              WHEN list_position(
                     list_transform(
                       generate_series(1, least(length(term), length(prev))),
                       i -> CASE WHEN substr(term, i, 1) = substr(prev, i, 1)
                                 THEN 1 ELSE 0 END),
                     0) IS NULL
                THEN least(length(term), length(prev))
              ELSE list_position(
                     list_transform(
                       generate_series(1, least(length(term), length(prev))),
                       i -> CASE WHEN substr(term, i, 1) = substr(prev, i, 1)
                                 THEN 1 ELSE 0 END),
                     0) - 1
         END AS lcp
  FROM tsorted
),
sized AS (
  SELECT CAST(length(term) AS BIGINT) AS raw,
         CAST(length(term) - lcp AS BIGINT) AS front
  FROM lcps
)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(raw) AS BIGINT) AS raw_bytes,
       CAST(sum(front) AS BIGINT) AS front_bytes,
       CAST(floor(CAST(sum(raw) - sum(front) AS DOUBLE)
                  / CAST(sum(raw) AS DOUBLE) * 1000000.0) AS BIGINT) AS savings_ppm
FROM sized
"""


@gate("term_dict_prefix_stats", _PREFIX_SQL)
def term_dict_prefix_stats(spark, sf_dir):
    """Front-coding savings over the sorted term dictionary."""
    from lucenenet_spark.index.layout_stats import term_dict_prefix_stats as _tps

    idx, _, _ = get_engine(spark, sf_dir)
    return _tps(idx)


# ----------------------------------------------------------------------
# index_options_size_audit — FieldInfo.IndexOptions integer cost per
# level (FieldInfo.cs:316-356) on the real postings; positions count ==
# sum(tf) by the inversion invariant.
# ----------------------------------------------------------------------
_OPTIONS_SQL = SQL_PRELUDE + """
SELECT CAST(count(*) AS BIGINT) AS n_postings,
       CAST(count(*) AS BIGINT) AS ints_docs_only,
       CAST(count(*) * 2 AS BIGINT) AS ints_docs_freqs,
       CAST(count(*) * 2 + sum(tf) AS BIGINT) AS ints_positions
FROM post
"""


@gate("index_options_size_audit", _OPTIONS_SQL)
def index_options_size_audit(spark, sf_dir):
    """Integer-cost audit of the three IndexOptions levels."""
    from lucenenet_spark.index.layout_stats import index_options_size_audit as _ioa

    idx, _, _ = get_engine(spark, sf_dir)
    return _ioa(idx)
