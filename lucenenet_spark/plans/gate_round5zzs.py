"""Gate registry round-5 part zzs: k-core peeling rounds (Seidman'83 /
Montresor TPDS'13) and Newman degree assortativity, both over the
shared deterministic link graph.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

_KC_K = 3
_KC_ROUNDS = 4

_UND = """
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)"""


def _kcore_sql() -> str:
    ctes = [f"{_GRAPH_CTES},{_UND}", "e0 AS (SELECT a, b FROM und)"]
    selects = []
    for r in range(1, _KC_ROUNDS + 1):
        p = r - 1
        ctes.append(f"""
d{r} AS (
  SELECT node, count(*) AS deg
  FROM (SELECT a AS node FROM e{p} UNION ALL SELECT b AS node FROM e{p})
  GROUP BY node
),
n{r} AS (SELECT node FROM d{r} WHERE deg >= {_KC_K}),
e{r} AS (
  SELECT e.a, e.b FROM e{p} e
  JOIN n{r} x ON x.node = e.a
  JOIN n{r} y ON y.node = e.b
)""")
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS round, "
            f"CAST((SELECT count(*) FROM n{r}) AS BIGINT) AS n_remaining"
        )
    return "WITH " + ",".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@gate("kcore_peel", _kcore_sql())
def kcore_peel(spark, sf_dir):
    """3-core peel, 4 unrolled rounds over the link graph."""
    import os

    from lucenenet_spark.functions.pagerank import build_link_graph
    from lucenenet_spark.functions.pagerank import kcore_peel as _kc

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _kc(build_link_graph(docs), k=_KC_K, rounds=_KC_ROUNDS)


_DA_SQL = f"""
WITH {_GRAPH_CTES},{_UND},
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
  GROUP BY node
),
stubs AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS m_stubs,
         CAST(sum(du.deg) AS BIGINT) AS s1,
         CAST(sum(du.deg * du.deg) AS BIGINT) AS s2,
         CAST(sum(du.deg * dv.deg) AS BIGINT) AS sjk
  FROM stubs s
  JOIN deg du ON du.node = s.u
  JOIN deg dv ON dv.node = s.v
)
SELECT m_stubs, s1, s2, sjk,
       CASE WHEN CAST(m_stubs * s2 - s1 * s1 AS DOUBLE) <> 0.0 THEN
         CAST(floor(CAST(m_stubs * sjk - s1 * s1 AS DOUBLE)
              / CAST(m_stubs * s2 - s1 * s1 AS DOUBLE)
              * 1000000000.0 + 0.5) AS BIGINT)
       ELSE CAST(0 AS BIGINT) END AS r_q9
FROM mo
"""


@gate("degree_assortativity", _DA_SQL)
def degree_assortativity(spark, sf_dir):
    """Newman assortativity from exact integer stub moments."""
    import os

    from lucenenet_spark.functions.pagerank import build_link_graph
    from lucenenet_spark.functions.pagerank import degree_assortativity as _da

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return _da(build_link_graph(docs))
