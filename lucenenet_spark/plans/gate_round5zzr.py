"""Gate registry round-5 part zzr: related-pages signals — co-citation
(Small JASIS'73; Dean & Henzinger WWW'99) and bibliographic coupling
(Kessler 1963) over the shared deterministic link graph.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

_CC_K = 20

_CO_SQL = f"""
WITH {_GRAPH_CTES},
e AS (SELECT DISTINCT src, dst FROM edges),
p AS (
  SELECT e1.dst AS a, e2.dst AS b
  FROM e e1 JOIN e e2 USING (src) WHERE e1.dst < e2.dst
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n_common
FROM p GROUP BY a, b
ORDER BY n_common DESC, a ASC, b ASC LIMIT {_CC_K}
"""


@gate("cocitation_pairs", _CO_SQL)
def cocitation_pairs(spark, sf_dir):
    """Top-20 co-cited page pairs of the link graph."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph
    from lucenenet_spark.functions.pagerank import cocitation_pairs as _cc

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        _cc(build_link_graph(docs))
        .orderBy(F.desc("n_common"), F.asc("a"), F.asc("b"))
        .limit(_CC_K)
    )


_BC_SQL = f"""
WITH {_GRAPH_CTES},
e AS (SELECT DISTINCT src, dst FROM edges),
p AS (
  SELECT e1.src AS a, e2.src AS b
  FROM e e1 JOIN e e2 USING (dst) WHERE e1.src < e2.src
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n_shared
FROM p GROUP BY a, b
ORDER BY n_shared DESC, a ASC, b ASC LIMIT {_CC_K}
"""


@gate("bibliographic_coupling", _BC_SQL)
def bibliographic_coupling(spark, sf_dir):
    """Top-20 bibliographically coupled source pairs."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import bibliographic_coupling as _bc
    from lucenenet_spark.functions.pagerank import build_link_graph

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        _bc(build_link_graph(docs))
        .orderBy(F.desc("n_shared"), F.asc("a"), F.asc("b"))
        .limit(_CC_K)
    )
