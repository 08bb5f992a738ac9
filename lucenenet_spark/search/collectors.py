"""Collector-layer operators: facets, grouping, field sort, rescoring.

These are the reference's collector/module features re-expressed as plain
DataFrame compositions over (matching docs x metadata columns):

- facet_counts       FacetsCollector + FastTaxonomyFacetCounts
                     (Lucene.Net.Facet/Taxonomy/FastTaxonomyFacetCounts.cs)
- range_facet_counts LongRangeFacetCounts (Facet/Range/LongRangeFacetCounts.cs)
- drill_down         DrillDownQuery (Facet/DrillDownQuery.cs): query + dim filters
- drill_sideways     DrillSideways (Facet/DrillSideways.cs): per-dim counts with
                     that dim's own filter removed
- group_topk         grouping module two-pass collectors
                     (Lucene.Net.Grouping/Term/TermSecondPassGroupingCollector.cs)
- sort_topk          TopFieldCollector (Search/TopFieldCollector.cs)
- rescore            QueryRescorer (Search/QueryRescorer.cs): re-rank top-N
                     by combining first-pass and second-pass scores
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Query
from lucenenet_spark.search.searcher import IndexSearcher


def facet_counts(
    searcher: IndexSearcher, query: Query, meta: DataFrame, dim: str, top_n: int | None = None
) -> DataFrame:
    """(dim_value, cnt) over docs matching `query`; meta carries doc_id+dims."""
    m = searcher.docset(query).join(meta.select("doc_id", dim), "doc_id")
    out = m.groupBy(dim).agg(F.count(F.lit(1)).alias("cnt"))
    if top_n:
        out = out.orderBy(F.desc("cnt"), F.asc(dim)).limit(top_n)
    return out


def range_facet_counts(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    col: str,
    ranges: list[tuple[str, float | None, float | None]],
) -> DataFrame:
    """(bucket, cnt) for [lo, hi) ranges (None = open end)."""
    m = searcher.docset(query).join(meta.select("doc_id", col), "doc_id")
    expr = None
    for name, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= lo)
        if hi is not None:
            cond = cond & (F.col(col) < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    bucket = expr.otherwise(F.lit(None))
    return (
        m.select(bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def long_range_facet_counts(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    col: str,
    ranges: list[tuple[str, float | None, float | None]],
) -> DataFrame:
    """LongRangeFacetCounts (Facet/Range/RangeFacetCounts.cs): a hit
    counts in EVERY [lo, hi) range containing its value — ranges may
    overlap, unlike range_facet_counts' first-match bucketing. One
    aggregate pass computes all R counters as independent predicate sums
    (map-side partial agg, single reduced row), then unpivots to
    (bucket, cnt) — no explode, no per-range scans."""
    m = searcher.docset(query).join(meta.select("doc_id", col), "doc_id")
    aggs = []
    for name, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= lo)
        if hi is not None:
            cond = cond & (F.col(col) < hi)
        aggs.append(F.sum(cond.cast("long")).alias(name))
    row = m.agg(*aggs)
    stack = ", ".join(f"'{n}', `{n}`" for n, _, _ in ranges)
    return row.selectExpr(f"stack({len(ranges)}, {stack}) as (bucket, cnt)")


def drill_down(
    searcher: IndexSearcher, query: Query, meta: DataFrame, filters: dict[str, object]
) -> DataFrame:
    """DrillDownQuery: base query AND dim=value filters -> doc set."""
    m = searcher.docset(query).join(meta, "doc_id")
    for dim, val in filters.items():
        m = m.filter(F.col(dim) == val)
    return m.select("doc_id")


def drill_sideways(
    searcher: IndexSearcher, query: Query, meta: DataFrame, filters: dict[str, object]
) -> dict[str, DataFrame]:
    """DrillSideways: for each drilldown dim, facet counts computed with all
    OTHER dims' filters applied but its own removed (so the UI can show the
    alternatives). Returns {dim: (value, cnt) DataFrame}."""
    base = searcher.docset(query).join(meta, "doc_id")
    out = {}
    for dim in filters:
        m = base
        for other, val in filters.items():
            if other != dim:
                m = m.filter(F.col(other) == val)
        out[dim] = m.groupBy(dim).agg(F.count(F.lit(1)).alias("cnt"))
    return out


def group_topk(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    group_col: str,
    k_per_group: int = 2,
) -> DataFrame:
    """Top-k docs per group by score (window row_number — the two-pass
    grouping collectors in one declarative plan)."""
    scored = searcher.scored(query).join(meta.select("doc_id", group_col), "doc_id")
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_per_group)
        .select(group_col, "doc_id", "score")
    )


def group_heads(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    group_col: str,
) -> DataFrame:
    """AllGroupHeadsCollector (Grouping/AllGroupHeadsCollector.cs): the
    single head document per group under the score sort (desc, doc_id
    tie-break) — group_topk's window with k=1, returned as
    (group, doc_id, score)."""
    scored = searcher.scored(query).join(meta.select("doc_id", group_col), "doc_id")
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(group_col, "doc_id", "score")
    )


def all_groups_count(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    group_col: str,
) -> DataFrame:
    """AllGroupsCollector (Grouping/Terms/TermAllGroupsCollector.cs):
    number of distinct groups with >= 1 matching doc — a docset join +
    countDistinct, no per-group state on the driver."""
    matched = searcher.docset(query).join(meta.select("doc_id", group_col), "doc_id")
    return matched.agg(F.countDistinct(group_col).alias("n_groups"))


def sort_topk(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    sort_cols: list[tuple[str, bool]],
    k: int = 10,
) -> DataFrame:
    """TopFieldCollector: top-k by arbitrary sort fields
    [(col, ascending)], doc_id as the final tie-break."""
    m = searcher.docset(query).join(meta, "doc_id")
    order = [F.asc(c) if asc else F.desc(c) for c, asc in sort_cols] + [F.asc("doc_id")]
    return m.orderBy(*order).limit(k)


def rescore(
    searcher: IndexSearcher,
    first_pass: Query,
    second_pass: Query,
    n: int = 100,
    k: int = 10,
    weight_first: float = 1.0,
    weight_second: float = 1.0,
) -> DataFrame:
    """QueryRescorer.Rescore: take top-N of the cheap query, re-score that
    candidate set with the expensive query, combine weighted sums (missing
    second-pass score = 0, as in the reference's combine(firstPassHasHit))."""
    top_n = searcher.search(first_pass, n).withColumnRenamed("score", "score1")
    second = searcher.scored(second_pass).withColumnRenamed("score", "score2")
    combined = top_n.join(second, "doc_id", "left").select(
        "doc_id",
        (
            F.lit(weight_first) * F.col("score1")
            + F.lit(weight_second) * F.coalesce(F.col("score2"), F.lit(0.0))
        ).alias("score"),
    )
    return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def total_hits(searcher: IndexSearcher, query: Query) -> int:
    """TotalHitCountCollector."""
    return searcher.count(query)


def facet_sum_association(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    dim: str,
    value_col: str,
    top_n: int | None = None,
) -> DataFrame:
    """Association facets (Lucene.Net.Facet/Taxonomy/
    TaxonomyFacetSumValueSource.cs / sum-int associations): per facet
    label, SUM of a per-doc association value over the matching docs —
    one shuffle on the label, map-side combined."""
    m = searcher.docset(query).join(meta.select("doc_id", dim, value_col), "doc_id")
    out = m.groupBy(dim).agg(F.sum(F.col(value_col)).alias("assoc_sum"))
    if top_n:
        out = out.orderBy(F.desc("assoc_sum"), F.asc(dim)).limit(top_n)
    return out


def sampled_facet_counts(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    dim: str,
    percent: int = 20,
    seed_mult: int = 2654435761,
) -> DataFrame:
    """RandomSamplingFacetsCollector analogue: facet counts over a
    deterministic pseudo-random doc sample (Knuth multiplicative hash of
    doc_id mod 100 < percent) — the fixed-seed variant of the reference's
    sampled collector, scaled back up by 100/percent (AmortizeFacetCounts
    idea). Engine-portable arithmetic: the identical expression runs in
    SQL.

    The hash multiplies only the LOW 31 BITS of doc_id (pmod first), so the
    product is bounded by 2^31 * 2654435761 ~ 5.7e18 < int64 max — no
    overflow-to-negative at any doc_id, and pmod keeps the remainder
    non-negative (a raw % on an overflowed negative product would pass
    `< percent` ~50% of the time instead of percent%). Scaling uses
    100.0/percent so percents that do not divide 100 (e.g. 33) scale
    correctly (x3.03, not x3)."""
    h = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(seed_mult), F.lit(100)
    )
    sample = searcher.docset(query).filter(h < F.lit(percent))
    m = sample.join(meta.select("doc_id", dim), "doc_id")
    return m.groupBy(dim).agg(
        F.floor(F.count(F.lit(1)) * F.lit(100.0) / F.lit(float(percent)) + F.lit(0.5))
        .cast("long")
        .alias("est_cnt")
    )


class TimeExceededError(Exception):
    """TimeLimitingCollector.TimeExceededException analogue."""


def time_limited_collect(df: DataFrame, timeout_sec: float):
    """TimeLimitingCollector (Search/TimeLimitingCollector.cs): run the
    query's action under a wall-clock budget; past it, the Spark job group
    is cancelled (all running tasks interrupted cluster-wide — the
    distributed analogue of the collector's per-hit clock check) and
    TimeExceededError is raised."""
    import threading
    import uuid

    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"time-limited-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "time_limited_collect", interruptOnCancel=True)
    fired = threading.Event()

    def cancel():
        fired.set()
        sc.cancelJobGroup(group)

    timer = threading.Timer(timeout_sec, cancel)
    timer.start()
    try:
        return df.collect()
    except Exception as e:  # noqa: BLE001 — py4j surfaces cancellation as JavaError
        if fired.is_set():
            raise TimeExceededError(
                f"query exceeded {timeout_sec}s time budget"
            ) from e
        raise
    finally:
        timer.cancel()
        sc.setJobGroup("", "")


def caching_collector(searcher: IndexSearcher, query: Query) -> DataFrame:
    """CachingCollector (Search/CachingCollector.cs): materialize the
    docset once (persisted), replay it into any number of downstream
    collectors (facets, grouping, rescoring) without re-running the
    query. Caller unpersists when done."""
    return searcher.docset(query).persist()


def early_terminating_topk(sorted_docs: DataFrame, k: int) -> DataFrame:
    """EarlyTerminatingSortingCollector (Search/EarlyTerminatingSortingCollector.cs):
    when the index layout is globally range-sorted by the sort key
    (builder.assign_doc_ids(order_col=...) — the index-sorting analogue),
    top-k by that key is `limit(k)`: CollectLimit executes partitions
    incrementally (1, then 4x more, ...) so only the leading partitions
    of the sorted layout are ever read — the other segments terminate
    early exactly as the reference collector throws
    CollectionTerminatedException per segment."""
    return sorted_docs.limit(k)


def group_distinct_values(matches: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """TermDistinctValuesCollector (Grouping/Term/TermDistinctValuesCollector.cs):
    per group, the distinct values of a second field among the matching
    docs — (group, n_distinct, values) with values sorted and
    comma-joined so the result stays hash-comparable. One partial
    aggregate (collect_set), bounded by the value-field cardinality."""
    vals = F.sort_array(F.collect_set(value_col))
    return matches.groupBy(group_col).agg(
        F.size(vals).cast("long").alias("n_distinct"),
        F.array_join(vals, ",").alias("values"),
    )


def sort_search_after(
    searcher: IndexSearcher,
    query: Query,
    meta: DataFrame,
    sort_col: str,
    after: tuple | None,
    k: int = 10,
    ascending: bool = False,
) -> DataFrame:
    """Field-sorted deep pagination — IndexSearcher.SearchAfter with a
    Sort (reference: Search/IndexSearcher.cs SearchAfter(..., Sort) +
    TopFieldCollector's PagingFieldCollector keyset: a hit qualifies
    iff its sort key strictly follows ``after`` = (field_value, doc_id)
    of the previous page's last hit).  The score-sorted variant is
    IndexSearcher.search_after; this adds the field-sort axis with the
    same no-deepening property: page N filters with a keyset predicate
    and never re-collects pages 1..N-1 (no limit(N*k) blow-up).

    Output: (rank, doc_id, <sort_col>) for the page, rank local to it.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = searcher.docset(query).join(meta.select("doc_id", sort_col), "doc_id")
    if after is not None:
        a_val, a_doc = after
        if ascending:
            keyset = (F.col(sort_col) > F.lit(a_val)) | (
                (F.col(sort_col) == F.lit(a_val)) & (F.col("doc_id") > F.lit(int(a_doc)))
            )
        else:
            keyset = (F.col(sort_col) < F.lit(a_val)) | (
                (F.col(sort_col) == F.lit(a_val)) & (F.col("doc_id") > F.lit(int(a_doc)))
            )
        m = m.filter(keyset)
    order = [F.asc(sort_col) if ascending else F.desc(sort_col), F.asc("doc_id")]
    from pyspark.sql import Window

    w = Window.orderBy(*order)
    return (
        m.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", sort_col)
    )


def skyline_docs(scored: DataFrame, better_desc: str, better_asc: str) -> DataFrame:
    """Skyline / Pareto-optimal documents (Börzsönyi, Kossmann &
    Stocker, "The Skyline Operator", ICDE 2001): keep rows not
    DOMINATED on two preference dimensions — ``better_desc`` (higher is
    better, e.g. the quantized score) and ``better_asc`` (lower is
    better, e.g. document length).  a dominates b when a is >= on the
    desc dimension, <= on the asc dimension, and strictly better on at
    least one.

    Plan: the dominance check is one self-join anti-semi (LEFT ANTI on
    the dominance predicate) — O(n²) pairs at worst, which is fine for
    a top-k candidate pool; a corpus-wide skyline would pre-partition
    by a grid on one dimension and merge partial skylines (the paper's
    divide-and-conquer), same predicate.
    """
    a = scored.alias("a")
    b = scored.alias("b")
    dom = (
        (F.col(f"b.{better_desc}") >= F.col(f"a.{better_desc}"))
        & (F.col(f"b.{better_asc}") <= F.col(f"a.{better_asc}"))
        & (
            (F.col(f"b.{better_desc}") > F.col(f"a.{better_desc}"))
            | (F.col(f"b.{better_asc}") < F.col(f"a.{better_asc}"))
        )
    )
    return a.join(b, dom, "left_anti")


def score_percentiles(scored: DataFrame, value_col: str, qs=(50, 90, 99)) -> DataFrame:
    """EXACT score percentiles by rank selection (nearest-rank
    definition: the value at rank ceil(q/100 * n) of the ascending
    sort) — the serving-quality dashboard row, computed without the
    approximate-quantile sketch so any engine reproduces it.  Output
    (pct, n, value); one global sort window over the (small) scored
    frame — for corpus-scale inputs switch to two-pass manual binning,
    same output contract.
    """
    qs = sorted(set(int(q) for q in qs))
    if not qs or qs[0] < 1 or qs[-1] > 100:
        raise ValueError("percentiles must be in 1..100")
    ranked = scored.select(F.col(value_col).alias("v")).withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.asc("v"))).cast("long")
    )
    tot = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    spark = scored.sparkSession
    qdf = spark.createDataFrame([(q,) for q in qs], "pct long")
    tgt = qdf.crossJoin(F.broadcast(tot)).select(
        "pct", "n", F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("long").alias("r")
    )
    return tgt.join(ranked, F.col("rnk") == F.col("r")).select(
        "pct", "n", F.col("v").alias("value")
    )
