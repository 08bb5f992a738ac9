"""Query-log analysis over the events table.

``click_entropy`` — click-entropy intent classification (Dou, Song &
Wen, "A Large-scale Evaluation and Analysis of Personalized Search
Strategies", WWW 2007 §4.2): the Shannon entropy of a query's click
distribution separates NAVIGATIONAL queries (everyone clicks the same
result, entropy ~ 0 — personalization and diversification are wasted)
from INFORMATIONAL ones (clicks spread wide, entropy high).  Here the
events table plays the role of the click log: ``event_type`` is the
query class and the integer in ``props`` is the clicked item.

Determinism: per-class -p·ln(p) contributions are quantized to q9
integers BEFORE the per-query sum (the bpref discipline), so the
entropy total never depends on double summation order.  Output per
query: (event_type, n_clicks, n_distinct, entropy_q9).

Scale shape: one groupBy(query, item) + one groupBy(query) — map-side
combinable counts over the raw log, no state beyond the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["click_entropy"]


def click_entropy(events: DataFrame) -> DataFrame:
    """(event_type, n_clicks, n_distinct, entropy_q9) per query class."""
    clicks = events.select(
        "event_type",
        F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long").alias("item"),
    )
    per_item = clicks.groupBy("event_type", "item").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = per_item.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_clicks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    contrib = per_item.join(totals, "event_type").select(
        "event_type",
        "n_clicks",
        "n_distinct",
        F.floor(
            -(F.col("c").cast("double") / F.col("n_clicks").cast("double"))
            * F.log(F.col("c").cast("double") / F.col("n_clicks").cast("double"))
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("h_q9"),
    )
    return contrib.groupBy("event_type", "n_clicks", "n_distinct").agg(
        F.sum("h_q9").cast("long").alias("entropy_q9")
    )


def static_cache_hit_rate(
    events: DataFrame, capacities=(1, 2, 4, 8, 16, 32)
) -> DataFrame:
    """Static result-cache planning curve (Markatos, "On Caching Search
    Engine Query Results", Computer Communications 2001; Baeza-Yates et
    al., "The Impact of Caching on Search Engines", SIGIR 2007): fill a
    cache of capacity C with the C most frequent queries of the log and
    report the hit rate — the capacity/hit-rate curve that sizes a
    result-cache tier (web query logs are Zipfian, so small C captures
    a large hit share; the curve makes that concrete for THIS log).

    Queries are the integer ids in ``props`` (the click_entropy
    convention); admission order (freq DESC, id ASC).  All counts
    exact; hit_rate quantized q6.  Output per capacity:
    (capacity, cached, hits, total, hit_rate_q6).
    """
    from pyspark.sql import Window

    caps = sorted(set(int(c) for c in capacities))
    if not caps or caps[0] < 1:
        raise ValueError(f"capacities must be positive, got {capacities}")
    q = events.select(
        F.regexp_extract(F.col("props"), "[0-9]+", 0).cast("long").alias("qid")
    )
    freq = q.groupBy("qid").agg(F.count(F.lit(1)).cast("long").alias("f"))
    w = Window.orderBy(F.desc("f"), F.asc("qid"))
    cum = freq.withColumn("rank", F.row_number().over(w).cast("long")).withColumn(
        "cum_f",
        F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    total = freq.agg(
        F.sum("f").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
    )
    caps_df = events.sparkSession.createDataFrame(
        [(c,) for c in caps], "capacity long"
    )
    # hits(C) = cum_f at rank min(C, n_queries)
    picked = (
        caps_df.crossJoin(F.broadcast(total))
        .withColumn("rank", F.least(F.col("capacity"), F.col("n_queries")))
        .join(cum.select("rank", "cum_f"), "rank")
    )
    return picked.select(
        "capacity",
        F.col("rank").alias("cached"),
        F.col("cum_f").alias("hits"),
        "total",
        F.floor(
            F.col("cum_f").cast("double") / F.col("total").cast("double")
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("hit_rate_q6"),
    )


def event_markov_transitions(events: DataFrame, k: int = 15) -> DataFrame:
    """First-order Markov transition table over each user's event-type
    sequence — the session-model building block of query-log analysis
    (chains of the kind Silverstein et al., "Analysis of a very large
    web search engine query log", SIGIR Forum 1999 tabulate).

    Per user, events ordered by (ts, event_id); each consecutive pair
    contributes one (src -> dst) transition.  Output the top-k
    transitions by count: (src, dst, cnt, row_total, prob_q6) with
    prob = cnt / row_total (all transitions leaving src), one IEEE
    division then q6-quantized.  One lag window partitioned by user +
    two counting aggregates — no driver state.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = events.select(
        "user_id", "event_id", "ts", F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    row_tot = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("row_total"))
    out = trans.join(row_tot, "src").select(
        "src", "dst", "cnt", "row_total",
        F.floor(
            F.col("cnt").cast("double") / F.col("row_total").cast("double")
            * F.lit(1e6) + F.lit(0.5)
        ).cast("long").alias("prob_q6"),
    )
    return out.orderBy(F.desc("cnt"), F.asc("src"), F.asc("dst")).limit(k)


def markov_conditional_entropy(events: DataFrame) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event-type
    Markov chain (Shannon 1948's entropy rate for a first-order chain)
    — how predictable the next action is given the current one; the
    sequence-level companion of event_markov_transitions.

        H = sum_xy (c_xy / N) * ln(rowtotal_x / c_xy)

    Determinism: per transition cell the scaled contribution
    floor(c_xy * ln(rt_x / c_xy) * 1e9 + 0.5) is quantized FIRST, the
    bigints are summed (order-free), and the final normalization is the
    exact integer division sum // N (the unigram_entropy discipline).
    Output one row: (n_transitions, n_states, h_sum_q9, h_cond_q9).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = events.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    trans = seq.groupBy("src", "dst").agg(F.count("*").cast("long").alias("cnt"))
    rt = trans.groupBy("src").agg(F.sum("cnt").cast("long").alias("row_total"))
    j = trans.join(rt, "src")
    contrib = F.floor(
        F.col("cnt").cast("double")
        * F.log(F.col("row_total").cast("double") / F.col("cnt").cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    m = j.select(contrib.alias("c_q9"), "cnt", "src").agg(
        F.sum("cnt").cast("long").alias("n_transitions"),
        F.count_distinct("src").cast("long").alias("n_states"),
        F.sum("c_q9").cast("long").alias("h_sum_q9"),
    )
    return m.select(
        "n_transitions",
        "n_states",
        "h_sum_q9",
        F.expr("h_sum_q9 div n_transitions").cast("long").alias("h_cond_q9"),
    )
