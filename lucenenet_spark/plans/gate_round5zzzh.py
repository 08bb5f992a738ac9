"""Gate registry round-5 part zzzh: k-center farthest-first coreset
selection and leave-one-out 1-NN label error over the embeddings table.
Both run on component-quantized vectors (floor(v*1000+0.5) per
component), so every distance is an exact bigint and the selections are
bit-deterministic across engines.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_KC_K = 5
_QCOMP = """
eq AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0 + 0.5) AS BIGINT) AS vq,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
)
"""


def _kc_sql(k: int) -> str:
    parts = [
        _QCOMP.strip(),
        """d2all AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(sum((a.vq - b.vq) * (a.vq - b.vq)) AS BIGINT) AS d2
  FROM eq a JOIN eq b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
)""",
        "ch1 AS (SELECT CAST(min(vec_id) AS BIGINT) AS vec_id FROM embeddings)",
        "row1 AS (SELECT CAST(1 AS BIGINT) AS \"round\", vec_id, CAST(0 AS BIGINT) AS maxmin_d2 FROM ch1)",
    ]
    for r in range(2, k + 1):
        parts.append(f"""w{r} AS (
  SELECT d.va AS vec_id, CAST(min(d.d2) AS BIGINT) AS maxmin_d2
  FROM d2all d JOIN ch{r - 1} c ON d.vb = c.vec_id
  WHERE d.va NOT IN (SELECT vec_id FROM ch{r - 1})
  GROUP BY d.va
  ORDER BY maxmin_d2 DESC, vec_id ASC LIMIT 1
)""")
        parts.append(
            f"ch{r} AS (SELECT vec_id FROM ch{r - 1} UNION ALL SELECT vec_id FROM w{r})"
        )
        parts.append(
            f"row{r} AS (SELECT CAST({r} AS BIGINT) AS \"round\", vec_id, maxmin_d2 FROM w{r})"
        )
    union = " UNION ALL ".join(f"SELECT * FROM row{r}" for r in range(1, k + 1))
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({union}) ORDER BY \"round\" ASC"


@gate("kcenter_coreset", _kc_sql(_KC_K))
def kcenter_coreset(spark, sf_dir):
    """Gonzalez farthest-first k=5 over the embeddings table."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.similarity import kcenter_select

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return kcenter_select(emb, k=_KC_K).orderBy(F.asc("round"))


_LOO_SQL = "WITH " + _QCOMP.strip() + """,
d2 AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CAST(sum((a.vq - b.vq) * (a.vq - b.vq)) AS BIGINT) AS d2
  FROM eq a JOIN eq b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
nn AS (
  SELECT va, vb FROM (
    SELECT va, vb, row_number() OVER (PARTITION BY va ORDER BY d2 ASC, vb ASC) AS rn
    FROM d2
  ) WHERE rn = 1
),
lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)
SELECT la.label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN la.label <> lb.label THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(sum(CASE WHEN la.label <> lb.label THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS err_ppm
FROM nn JOIN lab la ON nn.va = la.vec_id JOIN lab lb ON nn.vb = lb.vec_id
GROUP BY la.label
ORDER BY la.label ASC
"""


@gate("loo_1nn_error", _LOO_SQL)
def loo_1nn_error(spark, sf_dir):
    """Leave-one-out 1-NN label error per class over embeddings."""
    import os

    from lucenenet_spark.functions.similarity import loo_1nn_errors

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return loo_1nn_errors(emb)
