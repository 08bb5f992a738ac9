"""Query-planning cost models: strategy choices the serving engine makes
from term-dictionary statistics alone.

* ``index_or_docvalues_choice`` — the successor engine's
  IndexOrDocValuesQuery: a range filter running beside a selective lead
  query can be answered two ways — materialize the range's docset from
  the inverted index (cost ~ Σ df over the range's terms) or verify
  each lead candidate with a per-doc column lookup (cost ~ lead df ×
  verify_ratio, the lookup being ~an order of magnitude dearer per doc
  than a postings scan step).  The audit prices both per lead query and
  records the winner — all exact integers off the term dictionary, no
  data scan at decision time, which is exactly why the trick matters at
  10^12 docs.

* ``intersection_order_audit`` — conjunction processing order: the
  classic df-ascending heuristic (smallest posting list leads; Broder
  et al., "Efficient query evaluation using a two-level retrieval
  process", CIKM 2003 frame the same cost shape for WAND's AND mode).
  For each prefix of the df-sorted term list the audit reports the TRUE
  intersection cardinality, the quantity each successive leapfrog step
  is bounded by.  One pass over the terms' postings: per-doc
  step-prefix length via a sorted-set fold, then a count per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def index_or_docvalues_choice(
    index: InvertedIndex,
    lead_terms: list[str],
    range_lo: str,
    range_hi: str,
    verify_ratio: int = 8,
    field: str | None = None,
) -> DataFrame:
    """Per lead term: (lead_term, lead_df, range_n_terms, range_cost,
    verify_cost, chosen) — chosen = 'docvalues' when lead_df *
    verify_ratio < range_cost, else 'index'.  Range is the term
    interval [range_lo, range_hi)."""
    if not lead_terms or len(set(lead_terms)) != len(lead_terms):
        raise ValueError("lead_terms must be non-empty and distinct")
    if verify_ratio < 1:
        raise ValueError("verify_ratio must be >= 1")
    fld = field or index.default_field
    ts = index.term_stats.filter(F.col("field") == fld)
    rng = ts.filter((F.col("term") >= range_lo) & (F.col("term") < range_hi)).agg(
        F.count(F.lit(1)).cast("long").alias("range_n_terms"),
        F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("range_cost"),
    )
    spark = index.postings.sparkSession
    leads = spark.createDataFrame([(t,) for t in lead_terms], "lead_term string")
    lstats = leads.join(
        ts.select(F.col("term").alias("lead_term"), "df"), "lead_term", "left"
    ).select("lead_term", F.coalesce(F.col("df"), F.lit(0)).cast("long").alias("lead_df"))
    out = lstats.crossJoin(rng)
    verify_cost = F.col("lead_df") * F.lit(int(verify_ratio))
    return out.select(
        "lead_term", "lead_df", "range_n_terms", "range_cost",
        verify_cost.cast("long").alias("verify_cost"),
        F.when(verify_cost < F.col("range_cost"), F.lit("docvalues"))
        .otherwise(F.lit("index"))
        .alias("chosen"),
    )


def intersection_order_audit(
    index: InvertedIndex, terms: list[str], field: str | None = None
) -> DataFrame:
    """Per df-ascending prefix of ``terms``: (step, term, df,
    inter_size) with inter_size the exact cardinality of the
    intersection of the first ``step`` posting lists (ties on df break
    by term).  The monotone shrink of inter_size is what makes
    smallest-first the right leapfrog order."""
    if len(terms) < 2 or len(set(terms)) != len(terms):
        raise ValueError("need >= 2 distinct terms")
    fld = field or index.default_field
    stats = (
        index.term_stats.filter((F.col("field") == fld) & F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: int(r["df"]) for r in stats}
    order = sorted(terms, key=lambda t: (df_by_term.get(t, 0), t))
    spark = index.postings.sparkSession
    sel = spark.createDataFrame(
        [(i + 1, t, df_by_term.get(t, 0)) for i, t in enumerate(order)],
        "step long, term string, df long",
    )
    dt = (
        index.postings.filter((F.col("field") == fld) & F.col("term").isin(terms))
        .select("doc_id", "term")
        .join(F.broadcast(sel.select("term", "step")), "term")
    )
    # prefix length of the doc's sorted step set: h1*(1+h2*(1+...)),
    # i.e. how many leading steps the doc covers without a gap
    n = len(order)
    arr = F.array_sort(F.collect_set("step"))
    per = dt.groupBy("doc_id").agg(arr.alias("steps"))
    plen = F.lit(0)
    for k in range(n, 0, -1):
        plen = F.when(
            F.array_contains(F.col("steps"), k), F.lit(1) + plen
        ).otherwise(F.lit(0))
    per = per.select("doc_id", plen.alias("plen"))
    joined = sel.join(per, per["plen"] >= sel["step"], "left")
    return (
        joined.groupBy("step", "term", "df")
        .agg(F.count("plen").cast("long").alias("inter_size"))
        .select("step", "term", "df", "inter_size")
    )
