"""Gate registry round-5 part zzn: webgraph triangle counting and
clustering coefficients (Suri & Vassilvitskii WWW'11 wedge-closure;
Watts & Strogatz 1998 local coefficient) over the shared deterministic
link graph.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

_TRI_CTES = f"""{_GRAPH_CTES},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
),
degs AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
),
nbr AS (
  SELECT a AS apex, b AS x FROM und
  UNION ALL SELECT b AS apex, a AS x FROM und
),
wed AS (
  SELECT n1.apex, n1.x, n2.x AS y
  FROM nbr n1 JOIN nbr n2 USING (apex)
  WHERE n1.apex < n1.x AND n1.x < n2.x
),
tri AS (
  SELECT w.apex AS v1, w.x AS v2, w.y AS v3
  FROM wed w JOIN und u ON u.a = w.x AND u.b = w.y
),
pert AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri
  FROM (SELECT v1 AS node FROM tri
        UNION ALL SELECT v2 AS node FROM tri
        UNION ALL SELECT v3 AS node FROM tri)
  GROUP BY node
)"""

# ----------------------------------------------------------------------
# triangle_transitivity — one summary row with the global transitivity
# ratio 3T / #wedges.
# ----------------------------------------------------------------------
_TT_SQL = f"""
WITH {_TRI_CTES}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM degs) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges_und,
       (SELECT CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) FROM degs) AS n_wedges,
       (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
       CAST(floor(3.0 * (SELECT count(*) FROM tri)
            / (SELECT sum(deg * (deg - 1)) / 2.0 FROM degs)
            * 1000000000.0 + 0.5) AS BIGINT) AS global_cc_q9
"""


@gate("triangle_transitivity", _TT_SQL)
def triangle_transitivity(spark, sf_dir):
    """Global triangle count + transitivity over the link graph."""
    import os

    from lucenenet_spark.functions.pagerank import build_link_graph, triangle_summary

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return triangle_summary(build_link_graph(docs))


# ----------------------------------------------------------------------
# local_clustering_topk — 15 most clustered nodes (cc, then node id).
# ----------------------------------------------------------------------
_LC_SQL = f"""
WITH {_TRI_CTES}
SELECT d.node, d.deg,
       CAST(coalesce(p.tri, 0) AS BIGINT) AS tri,
       CASE WHEN d.deg >= 2 THEN
         CAST(floor(2.0 * coalesce(p.tri, 0) / (d.deg * (d.deg - 1))
              * 1000000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS cc_q9
FROM degs d LEFT JOIN pert p USING (node)
ORDER BY cc_q9 DESC, node ASC LIMIT 15
"""


@gate("local_clustering_topk", _LC_SQL)
def local_clustering_topk(spark, sf_dir):
    """Top-15 nodes by Watts-Strogatz local clustering coefficient."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, local_clustering

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        local_clustering(build_link_graph(docs))
        .orderBy(F.desc("cc_q9"), F.asc("node"))
        .limit(15)
    )
