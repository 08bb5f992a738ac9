"""Gate registry round-5 part zzz: bounded BFS distances and harmonic
centrality (Boldi & Vigna 2014) over the shared link graph.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

_BF_SRC = 0
_BF_HOPS = 6


def _bfs_ctes() -> str:
    parts = [
        f"{_GRAPH_CTES}",
        "e AS (SELECT DISTINCT src, dst FROM edges)",
        f"d0 AS (SELECT CAST({_BF_SRC} AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)",
    ]
    for r in range(1, _BF_HOPS + 1):
        p = r - 1
        parts.append(f"""
d{r} AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM e JOIN d{p} d ON d.node = e.src
  ) GROUP BY node
)""")
    return ",".join(parts)


_BF_SQL = f"""
WITH {_bfs_ctes()}
SELECT node, dist FROM d{_BF_HOPS}
"""


@gate("bfs_distances", _BF_SQL)
def bfs_distances(spark, sf_dir):
    """Hop distances from node 0 within 6 supersteps."""
    import os

    from lucenenet_spark.functions.pagerank import bfs_distances as _bf
    from lucenenet_spark.functions.pagerank import build_link_graph

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _bf(build_link_graph(docs), source=_BF_SRC, max_hops=_BF_HOPS)


_HC_SQL = f"""
WITH {_bfs_ctes()}
SELECT CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(CAST(floor(1000000000.0 / dist) AS BIGINT)) AS BIGINT)
         AS harmonic_q9_sum
FROM d{_BF_HOPS} WHERE dist > 0
"""


@gate("harmonic_centrality", _HC_SQL)
def harmonic_centrality(spark, sf_dir):
    """Bounded harmonic centrality of node 0 (integer contributions)."""
    import os

    from lucenenet_spark.functions.pagerank import build_link_graph
    from lucenenet_spark.functions.pagerank import harmonic_centrality_seed as _hc

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _hc(build_link_graph(docs), source=_BF_SRC, max_hops=_BF_HOPS)
