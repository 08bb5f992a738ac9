"""Gate registry round-5 part zzl: zone-map pruning priced on two
layouts (Moerkotte VLDB'98 / parquet row-group stats) and the
Matryoshka prefix-dimension retrieval audit (Kusupati NeurIPS'22).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_ZM_LO, _ZM_HI = 50.0, 60.0
_ZM_BLK = 128


def _zm_cte(order_by: str, layout: str) -> str:
    return f"""
SELECT '{layout}' AS layout,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
       CAST(sum(CASE WHEN pruned THEN 0 ELSE cnt END) AS BIGINT) AS rows_scanned,
       CAST(sum(matched) AS BIGINT) AS rows_matched
FROM (
  SELECT vmax < {_ZM_LO!r} OR vmin > {_ZM_HI!r} AS pruned, cnt, matched
  FROM (
    SELECT min(value) AS vmin, max(value) AS vmax, count(*) AS cnt,
           sum(CASE WHEN value >= {_ZM_LO!r} AND value <= {_ZM_HI!r}
               THEN 1 ELSE 0 END) AS matched
    FROM (
      SELECT value,
             CAST((row_number() OVER (ORDER BY {order_by}) - 1) // {_ZM_BLK}
                  AS BIGINT) AS blk
      FROM events
    ) GROUP BY blk
  )
)
"""


_ZM_SQL = _zm_cte("event_id ASC", "by_id") + " UNION ALL " + _zm_cte(
    "value ASC, event_id ASC", "by_value"
)


@gate("zonemap_prune_audit", _ZM_SQL)
def zonemap_prune_audit(spark, sf_dir):
    """Zone-map skip rates for value BETWEEN 50 AND 60 under the
    arrival layout vs a value-sorted layout."""
    import os

    from lucenenet_spark.index.layout_stats import zonemap_prune_audit as _zm

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    a = _zm(ev, ["event_id"], "value", _ZM_LO, _ZM_HI, _ZM_BLK, "by_id")
    b = _zm(ev, ["value", "event_id"], "value", _ZM_LO, _ZM_HI, _ZM_BLK, "by_value")
    return a.unionByName(b)


# ----------------------------------------------------------------------
# dim_prefix_ann — overlap@10 of prefix-dimension cosine ranking vs the
# full-dimension exact ranking (query = vector 0, prefix 8 dims).
# ----------------------------------------------------------------------
_DP_K = 10
_DP_PREFIX = 8

_DP_SQL = f"""
WITH ev AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
qv AS (SELECT i, v FROM ev WHERE vec_id = 0),
fullr AS (
  SELECT d.vec_id
  FROM (
    SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS n2
    FROM ev e JOIN qv q USING (i) GROUP BY e.vec_id
  ) d, (SELECT sum(v * v) AS n2 FROM qv) qn
  ORDER BY CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) DESC,
           d.vec_id ASC
  LIMIT {_DP_K}
),
prer AS (
  SELECT d.vec_id
  FROM (
    SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS n2
    FROM ev e JOIN qv q USING (i)
    WHERE e.i <= {_DP_PREFIX} GROUP BY e.vec_id
  ) d, (SELECT sum(v * v) AS n2 FROM qv WHERE i <= {_DP_PREFIX}) qn
  ORDER BY CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) DESC,
           d.vec_id ASC
  LIMIT {_DP_K}
)
SELECT CAST({_DP_K} AS BIGINT) AS k,
       CAST({_DP_PREFIX} AS BIGINT) AS prefix_dim,
       CAST((SELECT count(*) FROM fullr f JOIN prer p USING (vec_id)) AS BIGINT)
         AS overlap
"""


@gate("dim_prefix_ann", _DP_SQL)
def dim_prefix_ann(spark, sf_dir):
    """Matryoshka audit: top-10 overlap, 8-dim prefix vs full vectors."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.similarity import dim_prefix_overlap

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    return dim_prefix_overlap(emb, qvec, prefix_dim=_DP_PREFIX, k=_DP_K)
