"""Gate registry round-5 part zzc: host-graph analysis — HostRank and
the WebGraph link-locality audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, _docs_table

_HR_D = 0.85
_HR_ITERS = 4
_HR_K = 10

# the shared deterministic page graph (functions/pagerank.py
# build_link_graph, bit-for-bit — same CTE as the pagerank/hits gates)
_GRAPH_CTES = """nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
edges AS (
  SELECT src,
         CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst,
         deg
  FROM (
    SELECT nd.doc_id AS src,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           CAST(nd.doc_id % 3 + 1 AS BIGINT) AS deg,
           nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
)"""


def _hostrank_sql() -> str:
    tele = 1.0 - _HR_D
    iters = []
    for k in range(1, _HR_ITERS + 1):
        iters.append(f"""
r{k} AS (
  SELECT hn.host,
         {tele!r} * (1.0 / hc.n) + {_HR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM hn
  LEFT JOIN (
    SELECT e.hd AS host, sum(r.pr / e.deg) AS m
    FROM he e JOIN r{k - 1} r ON r.host = e.hs GROUP BY e.hd
  ) c USING (host)
  CROSS JOIN hc
)""")
    return f"""
WITH {_GRAPH_CTES},
he0 AS (
  SELECT ds.source AS hs, dd.source AS hd
  FROM edges e
  JOIN documents ds ON ds.doc_id = e.src
  JOIN documents dd ON dd.doc_id = e.dst
),
hdeg AS (SELECT hs, CAST(count(*) AS BIGINT) AS deg FROM he0 GROUP BY 1),
he AS (SELECT h0.hs, h0.hd, d.deg FROM he0 h0 JOIN hdeg d USING (hs)),
hn AS (
  SELECT DISTINCT host FROM (
    SELECT hs AS host FROM he0 UNION ALL SELECT hd FROM he0)
),
hc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hn),
r0 AS (SELECT hn.host, 1.0 / hc.n AS pr FROM hn CROSS JOIN hc),{",".join(iters)}
SELECT CAST(row_number() OVER (ORDER BY pr_q7 DESC, host ASC) AS BIGINT) AS rank,
       host, pr_q7
FROM (
  SELECT host, CAST(floor(pr * 10000000.0 + 0.5) AS BIGINT) AS pr_q7
  FROM r{_HR_ITERS}
)
QUALIFY rank <= {_HR_K}
"""


@gate("hostrank_topk", _hostrank_sql())
def hostrank_topk(spark, sf_dir):
    """HostRank: 4 PageRank iterations over the source-host graph."""
    from lucenenet_spark.functions.pagerank import hostrank_topk as _hr

    return _hr(
        _docs_table(spark, sf_dir), iterations=_HR_ITERS, k=_HR_K, damping=_HR_D
    )


# ----------------------------------------------------------------------
# webgraph_locality — Boldi & Vigna WWW'04: how local are the links
# under the id ordering (the property gap+copy compression exploits).
# ----------------------------------------------------------------------
_WL_W = 16

_WL_SQL = f"""
WITH {_GRAPH_CTES},
g AS (SELECT abs(src - dst) AS gap FROM edges)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN gap <= {_WL_W} THEN 1 ELSE 0 END) AS BIGINT)
         AS within_window,
       CAST({_WL_W} AS BIGINT) AS window,
       CAST(sum(length(bin(gap + 1))) AS BIGINT) AS gap_bits,
       CAST(floor(CAST(sum(length(bin(gap + 1))) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS mean_gap_bits_q6
FROM g
"""


@gate("webgraph_locality", _WL_SQL)
def webgraph_locality(spark, sf_dir):
    """Link-gap locality and information content of the page graph."""
    from lucenenet_spark.functions.pagerank import webgraph_locality as _wl

    return _wl(_docs_table(spark, sf_dir), window=_WL_W)
