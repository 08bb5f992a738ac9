"""Gate registry round-5 part zzf: minimal-interval proximity semantics
(the modern-Lucene Intervals family; Clarke–Cormack algebra, Boldi &
Vigna SPIRE'06 lazy evaluation).

All three gates keep interval statistics as exact BIGINTs (counts,
width sums, min widths) so the hash comparison is bit-stable; the
oracle mirrors the engine's single-window-pass formulation (running
max over strictly-preceding rows, then min-end per maximal start).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

_PREV = (
    "(PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
)


def _ordered3_cte(t1: str, t2: str, t3: str) -> str:
    return f"""
z AS (
  SELECT doc_id, pos,
         CASE term WHEN '{t1}' THEN 0 WHEN '{t2}' THEN 1 ELSE 2 END AS rnk
  FROM tokf WHERE term IN ('{t1}', '{t2}', '{t3}')
),
w1 AS (
  SELECT doc_id, pos, rnk,
         max(CASE WHEN rnk = 0 THEN pos END) OVER prev AS c0
  FROM z WINDOW prev AS {_PREV}
),
w2 AS (
  SELECT doc_id, pos, rnk,
         max(CASE WHEN rnk = 1 THEN c0 END) OVER prev AS s
  FROM w1 WINDOW prev AS {_PREV}
),
mi AS (
  SELECT doc_id, s, min(pos) AS e
  FROM w2 WHERE rnk = 2 AND s IS NOT NULL
  GROUP BY doc_id, s
)
"""


# ----------------------------------------------------------------------
# interval_ordered_minimal — ordered 3-term minimal intervals, per-doc
# exact stats, top 20 by interval count.
# ----------------------------------------------------------------------
_IO_TERMS = ("scan", "join", "merge")

_IO_SQL = SQL_PRELUDE + "," + _ordered3_cte(*_IO_TERMS) + """
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(e - s) AS BIGINT) AS width_sum,
       CAST(min(e - s) AS BIGINT) AS min_width
FROM mi GROUP BY doc_id
ORDER BY n_intervals DESC, doc_id ASC LIMIT 20
"""


@gate("interval_ordered_minimal", _IO_SQL)
def interval_ordered_minimal(spark, sf_dir):
    """Intervals.ordered(scan, join, merge) under minimal-interval
    semantics; successor-engine refinement of the reference's
    NearSpansOrdered.cs span walk."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.intervals import (
        interval_doc_stats,
        minimal_ordered_intervals,
    )

    idx, _, _ = get_engine(spark, sf_dir)
    iv = minimal_ordered_intervals(idx, list(_IO_TERMS))
    return (
        interval_doc_stats(iv, n_terms=3)
        .orderBy(F.desc("n_intervals"), F.asc("doc_id"))
        .limit(20)
    )


# ----------------------------------------------------------------------
# interval_maxgaps — ordered 2-term minimal intervals filtered to
# <= MAXGAPS gap positions (Intervals.maxgaps), all matching docs.
# ----------------------------------------------------------------------
_MG_TERMS = ("hash", "table")
_MG_GAPS = 2

_MG_SQL = SQL_PRELUDE + f""",
z AS (
  SELECT doc_id, pos, CASE term WHEN '{_MG_TERMS[0]}' THEN 0 ELSE 1 END AS rnk
  FROM tokf WHERE term IN ('{_MG_TERMS[0]}', '{_MG_TERMS[1]}')
),
w1 AS (
  SELECT doc_id, pos, rnk,
         max(CASE WHEN rnk = 0 THEN pos END) OVER prev AS s
  FROM z WINDOW prev AS {_PREV}
),
mi AS (
  SELECT doc_id, s, min(pos) AS e
  FROM w1 WHERE rnk = 1 AND s IS NOT NULL
  GROUP BY doc_id, s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(e - s) AS BIGINT) AS width_sum
FROM mi WHERE e - s - 1 <= {_MG_GAPS}
GROUP BY doc_id
"""


@gate("interval_maxgaps", _MG_SQL)
def interval_maxgaps(spark, sf_dir):
    """Intervals.maxgaps(2, ordered(hash, table)) — width-filtered
    minimal intervals, exact per-doc counts."""
    from lucenenet_spark.search.intervals import (
        interval_doc_stats,
        minimal_ordered_intervals,
    )

    idx, _, _ = get_engine(spark, sf_dir)
    iv = minimal_ordered_intervals(idx, list(_MG_TERMS))
    return interval_doc_stats(iv, n_terms=2, max_gaps=_MG_GAPS).select(
        "doc_id", "n_intervals", "width_sum"
    )


# ----------------------------------------------------------------------
# interval_unordered — two-term either-order minimal intervals, all
# matching docs with exact stats.
# ----------------------------------------------------------------------
_IU_TERMS = ("vector", "query")

_IU_SQL = SQL_PRELUDE + f""",
z AS (
  SELECT doc_id, pos, CASE term WHEN '{_IU_TERMS[0]}' THEN 0 ELSE 1 END AS rnk
  FROM tokf WHERE term IN ('{_IU_TERMS[0]}', '{_IU_TERMS[1]}')
),
w1 AS (
  SELECT doc_id, pos, rnk,
         max(CASE WHEN rnk = 0 THEN pos END) OVER prev AS la,
         max(CASE WHEN rnk = 1 THEN pos END) OVER prev AS lb
  FROM z WINDOW prev AS {_PREV}
),
cand AS (
  SELECT doc_id, CASE WHEN rnk = 0 THEN lb ELSE la END AS s, pos AS e
  FROM w1 WHERE (CASE WHEN rnk = 0 THEN lb ELSE la END) IS NOT NULL
),
mi AS (SELECT doc_id, s, min(e) AS e FROM cand GROUP BY doc_id, s)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(e - s) AS BIGINT) AS width_sum,
       CAST(min(e - s) AS BIGINT) AS min_width
FROM mi GROUP BY doc_id
"""


@gate("interval_unordered", _IU_SQL)
def interval_unordered(spark, sf_dir):
    """Intervals.unordered(vector, query) — either-order minimal
    intervals (maximal start = last other-term occurrence)."""
    from lucenenet_spark.search.intervals import (
        interval_doc_stats,
        minimal_unordered_intervals,
    )

    idx, _, _ = get_engine(spark, sf_dir)
    iv = minimal_unordered_intervals(idx, *_IU_TERMS)
    return interval_doc_stats(iv, n_terms=2)
