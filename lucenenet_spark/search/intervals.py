"""Minimal-interval proximity semantics (interval queries).

The modern-Lucene interval query family (``Intervals.ordered`` /
``Intervals.unordered`` / ``Intervals.maxgaps``) evaluates queries under
*minimal-interval semantics*: a document region [s, e] matches when it
contains the pattern and no strictly smaller region contained in it also
matches.  The algebra is published work — Clarke, Cormack & Burkowski,
"An algebra for structured text search" (Comput. J. 38(1), 1995), with
the lazy linear-time evaluation described by Boldi & Vigna, "Efficient
lazy algorithms for minimal-interval semantics" (SPIRE 2006).  The
reference repo's span family (``/root/reference/src/Lucene.Net/Search/
Spans/NearSpansOrdered.cs``) implements the older span semantics; this
module adds the interval refinement the successor engine exposes.

Spark-first shape: the classic evaluation is an iterator walk per
document.  Here each doc's token positions are a partition of a window
— ONE pass, no per-row Python, no position×position join:

- ordered(t1..tn): for an interval ending at an occurrence ``e`` of tn,
  the maximal start is found by walking each preceding term greedily as
  late as possible.  Because "latest chain start so far" is
  nondecreasing in position, every level of the walk is a running
  ``max(...) over (rows unbounded preceding to 1 preceding)`` — n-1
  stacked window columns, still one shuffle by doc_id.
- unordered({a, b}): the maximal-start candidate ending at position p is
  (last occurrence of the *other* term before p, p) — one window column.
- minimality: candidate starts are nondecreasing in end, so the minimal
  set is exactly ``min(e) GROUP BY (doc, s)``.

Width statistics are kept as exact integers (interval width ``e - s``,
gap count ``e - s - (n-1)``) so downstream gates hash bit-stably; the
1/(1+width) interval scoring the successor engine applies is a
deterministic function of the (width -> count) histogram this module
returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def _term_positions(index: InvertedIndex, term: str, rank: int, field: str | None) -> DataFrame:
    fld = field or index.default_field
    return (
        index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
        .select("doc_id", F.explode("positions").alias("pos"), F.lit(rank).alias("rank"))
    )


def minimal_ordered_intervals(
    index: InvertedIndex, terms: list[str], field: str | None = None
) -> DataFrame:
    """Minimal intervals containing ``terms`` in order -> (doc_id, s, e).

    Clarke–Cormack ordered followed-by under minimal-interval semantics.
    One window pass per doc: level i carries the latest start of a valid
    t1..t(i) chain seen strictly before the current position; a level-n
    row (an occurrence of the last term) whose carry is non-null is the
    maximal-start candidate for that end, and ``min(e) per (doc, s)``
    drops nested candidates.
    """
    n = len(terms)
    if n < 2:
        raise ValueError("ordered intervals need >= 2 terms")
    if len(set(terms)) != n:
        raise ValueError("interval terms must be distinct")
    parts = [_term_positions(index, t, i, field) for i, t in enumerate(terms)]
    z = parts[0]
    for p in parts[1:]:
        z = z.unionByName(p)
    strict_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry[0]: latest t1 position before here; carry[i]: latest start of a
    # full t1..t(i+1) chain before here.  Each is nondecreasing along the
    # doc, so running max == value at the latest qualifying row.
    carry = F.max(F.when(F.col("rank") == 0, F.col("pos"))).over(strict_prev)
    for i in range(1, n - 1):
        z = z.withColumn(f"_c{i - 1}", carry)
        carry = F.max(
            F.when(F.col("rank") == i, F.col(f"_c{i - 1}"))
        ).over(strict_prev)
    cand = (
        z.withColumn("s", carry)
        .filter((F.col("rank") == n - 1) & F.col("s").isNotNull())
        .select("doc_id", "s", F.col("pos").alias("e"))
    )
    return cand.groupBy("doc_id", "s").agg(F.min("e").alias("e"))


def minimal_unordered_intervals(
    index: InvertedIndex, term_a: str, term_b: str, field: str | None = None
) -> DataFrame:
    """Minimal intervals containing both terms in either order.

    For an interval ending at position p, the maximal start is the last
    occurrence of the *other* term strictly before p; ``min(e) per
    (doc, s)`` then removes nested candidates, exactly as in the ordered
    case.
    """
    if term_a == term_b:
        raise ValueError("unordered intervals need two distinct terms")
    z = _term_positions(index, term_a, 0, field).unionByName(
        _term_positions(index, term_b, 1, field)
    )
    strict_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_a = F.max(F.when(F.col("rank") == 0, F.col("pos"))).over(strict_prev)
    last_b = F.max(F.when(F.col("rank") == 1, F.col("pos"))).over(strict_prev)
    s = F.when(F.col("rank") == 0, last_b).otherwise(last_a)
    cand = (
        z.withColumn("s", s)
        .filter(F.col("s").isNotNull())
        .select("doc_id", "s", F.col("pos").alias("e"))
    )
    return cand.groupBy("doc_id", "s").agg(F.min("e").alias("e"))


def interval_doc_stats(
    intervals: DataFrame, n_terms: int, max_gaps: int | None = None
) -> DataFrame:
    """Per-doc exact interval statistics -> (doc_id, n_intervals,
    width_sum, min_width).

    ``max_gaps`` applies the Intervals.maxgaps filter: an interval with
    ``e - s - (n_terms - 1)`` gap positions beyond its own terms
    survives only if that count is <= max_gaps.  All outputs are exact
    BIGINTs (see module docstring).
    """
    width = F.col("e") - F.col("s")
    df = intervals
    if max_gaps is not None:
        df = df.filter(width - F.lit(n_terms - 1) <= F.lit(max_gaps))
    return df.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(width).cast("long").alias("width_sum"),
        F.min(width).cast("long").alias("min_width"),
    )
