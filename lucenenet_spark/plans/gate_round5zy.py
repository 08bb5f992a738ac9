"""Gate registry round-5 part zy: distributed-architecture planning —
doc/term partitioning cost model and the static result-cache curve.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# partitioning_cost — Moffat/Webber/Zobel/Baeza-Yates IR'07: network
# rows for doc-partitioned (S·k merge) vs term-partitioned (ship
# non-coordinator posting lists) from catalog stats only.
# ----------------------------------------------------------------------
_PC_TERMS = ("vector", "merge", "query")
_PC_NS = 4
_PC_K = 10

_PC_H8 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(term), {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    + f") % {_PC_NS}"
)

_PC_SQL = SQL_PRELUDE + f""",
st AS (
  SELECT term, CAST(df AS BIGINT) AS df, CAST({_PC_H8} AS BIGINT) AS shard
  FROM ts WHERE term IN ({", ".join(f"'{t}'" for t in _PC_TERMS)})
),
coord AS (
  SELECT shard AS cshard FROM st ORDER BY df ASC, term ASC LIMIT 1
),
tp AS (
  SELECT 'term_partitioned' AS strategy,
         CAST(count(DISTINCT shard) AS BIGINT) AS query_messages,
         CAST(sum(CASE WHEN shard <> c.cshard THEN df ELSE 0 END) AS BIGINT)
           AS network_rows
  FROM st, coord c
)
SELECT 'doc_partitioned' AS strategy,
       CAST({_PC_NS} AS BIGINT) AS query_messages,
       CAST({_PC_NS * _PC_K} AS BIGINT) AS network_rows
UNION ALL
SELECT strategy, query_messages, network_rows FROM tp
"""


@gate("partitioning_cost", _PC_SQL)
def partitioning_cost(spark, sf_dir):
    """Doc- vs term-partitioned network cost for a 3-term query."""
    from lucenenet_spark.search.sharded import partitioning_cost_model

    idx, _, _ = get_engine(spark, sf_dir)
    return partitioning_cost_model(idx, _PC_TERMS, n_shards=_PC_NS, k=_PC_K)


# ----------------------------------------------------------------------
# static_cache_curve — Markatos'01 / Baeza-Yates SIGIR'07: hit rate of
# a top-C static result cache over the events log.
# ----------------------------------------------------------------------
_SC_CAPS = (1, 2, 4, 8, 16, 32)

_SC_SQL = f"""
WITH q AS (
  SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS qid FROM events
),
freq AS (SELECT qid, CAST(count(*) AS BIGINT) AS f FROM q GROUP BY 1),
cum AS (
  SELECT qid, f,
         CAST(row_number() OVER (ORDER BY f DESC, qid ASC) AS BIGINT) AS rank,
         CAST(sum(f) OVER (ORDER BY f DESC, qid ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_f
  FROM freq
),
tot AS (
  SELECT CAST(sum(f) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_queries
  FROM freq
),
caps(capacity) AS (SELECT * FROM (VALUES {", ".join(f"({c})" for c in _SC_CAPS)}))
SELECT CAST(c.capacity AS BIGINT) AS capacity,
       CAST(least(c.capacity, t.n_queries) AS BIGINT) AS cached,
       m.cum_f AS hits, t.total,
       CAST(floor(CAST(m.cum_f AS DOUBLE) / CAST(t.total AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS hit_rate_q6
FROM caps c
CROSS JOIN tot t
JOIN cum m ON m.rank = least(c.capacity, t.n_queries)
"""


@gate("static_cache_curve", _SC_SQL)
def static_cache_curve(spark, sf_dir):
    """Hit-rate curve for top-C static caches over the events log."""
    import os

    from lucenenet_spark.functions.querylog import static_cache_hit_rate

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return static_cache_hit_rate(events, capacities=_SC_CAPS)
