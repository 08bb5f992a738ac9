"""Gate registry round-5 part zzzd: SimRank structural similarity over
the link graph and pHash perceptual near-dup over the binary payload
column.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, get_engine
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

# ----------------------------------------------------------------------
# simrank_related — 2 iterations, C = 4/5, fully integer-exact
# (rational-C rounding (8X + 5D) // (10D) per pair per iteration).
# ----------------------------------------------------------------------
_SR_SQL = f"""
WITH {_GRAPH_CTES},
inn AS (
  SELECT dst AS v, src AS i, CAST(count(*) AS BIGINT) AS m
  FROM edges GROUP BY 1, 2
),
indeg AS (SELECT v, CAST(sum(m) AS BIGINT) AS d FROM inn GROUP BY v),
x1 AS (
  SELECT a.v AS a, b.v AS b, CAST(sum(a.m * b.m) * 1000000000 AS BIGINT) AS x
  FROM inn a JOIN inn b ON a.i = b.i AND a.v < b.v GROUP BY 1, 2
),
s1 AS (
  SELECT x1.a, x1.b,
         CAST((8 * x + 5 * da.d * db.d) // (10 * da.d * db.d) AS BIGINT) AS s
  FROM x1 JOIN indeg da ON da.v = x1.a JOIN indeg db ON db.v = x1.b
),
s1p AS (SELECT a, b, s FROM s1 WHERE s > 0),
sym AS (
  SELECT a AS i, b AS j, s FROM s1p
  UNION ALL
  SELECT b AS i, a AS j, s FROM s1p
  UNION ALL
  SELECT DISTINCT i, i AS j, CAST(1000000000 AS BIGINT) AS s FROM inn
),
x2 AS (
  SELECT ia.v AS a, ib.v AS b, CAST(sum(ia.m * sym.s * ib.m) AS BIGINT) AS x
  FROM inn ia JOIN sym ON sym.i = ia.i JOIN inn ib ON ib.i = sym.j
  WHERE ia.v < ib.v GROUP BY 1, 2
),
s2 AS (
  SELECT x2.a, x2.b,
         CAST((8 * x + 5 * da.d * db.d) // (10 * da.d * db.d) AS BIGINT) AS s
  FROM x2 JOIN indeg da ON da.v = x2.a JOIN indeg db ON db.v = x2.b
)
SELECT a, b, s AS s_q9 FROM s2 WHERE s > 0
ORDER BY s_q9 DESC, a ASC, b ASC LIMIT 20
"""


@gate("simrank_related", _SR_SQL)
def simrank_related(spark, sf_dir):
    """Top-20 SimRank pairs (2 iterations) over the synthetic web graph."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, simrank_pairs

    _, _, docs = get_engine(spark, sf_dir)
    nodes = docs.select("doc_id")
    return (
        simrank_pairs(nodes, build_link_graph(nodes), iterations=2)
        .orderBy(F.desc("s_q9"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


# ----------------------------------------------------------------------
# phash_near_dup — DCT perceptual-hash fingerprints over the binary
# payload column, top-20 closest pairs by Hamming distance.  The 64-row
# quantized DCT basis is shared verbatim with the oracle.
# ----------------------------------------------------------------------


def _phash_sql() -> str:
    from lucenenet_spark.functions.multimodal import dct_table

    vals = ", ".join(f"({u}, {x}, {w})" for u, x, w in dct_table())
    return f"""
WITH t(u, x, w) AS (VALUES {vals}),
m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
pix AS (
  SELECT media_id,
         CAST((i - 1) // 8 AS INT) AS x,
         CAST((i - 1) % 8 AS INT) AS y,
         CAST(strpos('0123456789abcdef', substr(hx, CAST(i AS INT), 1)) - 1 AS BIGINT) AS p
  FROM (SELECT media_id, hx, unnest(generate_series(1, 64)) AS i FROM m)
),
coefs AS (
  SELECT media_id, tu.u AS u, tv.u AS v,
         CAST(sum(p * tu.w * tv.w) AS BIGINT) AS c
  FROM pix JOIN t tu ON tu.x = pix.x JOIN t tv ON tv.x = pix.y
  GROUP BY 1, 2, 3
),
nd AS (SELECT * FROM coefs WHERE NOT (u = 0 AND v = 0)),
med AS (
  SELECT media_id, c AS med FROM (
    SELECT media_id, c,
           row_number() OVER (PARTITION BY media_id
                              ORDER BY c ASC, u ASC, v ASC) AS r
    FROM nd
  ) WHERE r = 32
),
fp AS (
  SELECT nd.media_id,
         CAST(sum(CASE WHEN c > med THEN CAST(pow(2, u * 8 + v - 1) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS phash
  FROM nd JOIN med USING (media_id) GROUP BY 1
)
SELECT a.media_id AS doc_a, b.media_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.media_id < b.media_id
ORDER BY hamming ASC, doc_a ASC, doc_b ASC LIMIT 20
"""


@gate("phash_near_dup", _phash_sql())
def phash_near_dup(spark, sf_dir):
    """Top-20 closest payloads by perceptual-hash Hamming distance."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.multimodal import phash_near_dup_pairs

    _, _, docs = get_engine(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
    )
    return phash_near_dup_pairs(media, top_n=20)
