"""Gate registry round-5 part zc: JL random projection audit and
CombMNZ score fusion.
"""

from __future__ import annotations

from lucenenet_spark.functions.similarity import jl_signs
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# jl_distance_audit — Achlioptas JCSS'03 ±1 projection 64 -> 16 dims
# over the embeddings table, distances audited against vec 0.
# Components quantized by a power of two FIRST, so every projection and
# squared distance is an exact integer in any engine; the sign matrix
# literal comes from jl_signs (single source of truth).
# ----------------------------------------------------------------------
_JL_DOUT = 16
_JL_PAIRS = 10


def _jl_sql() -> str:
    rows = ", ".join(f"({i}, {j}, {s})" for i, j, s in jl_signs(64, _JL_DOUT))
    return f"""
WITH signs(i, j, s) AS (VALUES {rows}),
comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024.0 + 0.5) AS BIGINT) AS xq
  FROM embeddings
),
proj AS (
  SELECT vec_id, sg.j, CAST(sum(c.xq * sg.s) AS BIGINT) AS yq
  FROM comp c JOIN signs sg USING (i)
  WHERE vec_id <= {_JL_PAIRS}
  GROUP BY vec_id, sg.j
),
pa AS (SELECT j, yq AS ya FROM proj WHERE vec_id = 0),
d2p AS (
  SELECT p.vec_id AS vec_b, CAST(sum((p.yq - pa.ya) * (p.yq - pa.ya)) AS BIGINT) AS d2_proj
  FROM proj p JOIN pa USING (j) WHERE p.vec_id >= 1 GROUP BY p.vec_id
),
ca AS (SELECT i, xq AS xa FROM comp WHERE vec_id = 0),
d2o AS (
  SELECT c.vec_id AS vec_b, CAST(sum((c.xq - ca.xa) * (c.xq - ca.xa)) AS BIGINT) AS d2_orig
  FROM comp c JOIN ca USING (i)
  WHERE c.vec_id BETWEEN 1 AND {_JL_PAIRS} GROUP BY c.vec_id
)
SELECT o.vec_b, o.d2_orig, p.d2_proj,
       CASE WHEN o.d2_orig > 0 THEN CAST(floor(
         sqrt(CAST(p.d2_proj AS DOUBLE) / {float(_JL_DOUT)!r})
         / sqrt(CAST(o.d2_orig AS DOUBLE)) * 10000.0 + 0.5) AS BIGINT)
       ELSE CAST(10000 AS BIGINT) END AS ratio_q4
FROM d2o o JOIN d2p p USING (vec_b)
ORDER BY vec_b ASC
"""


@gate("jl_distance_audit", _jl_sql())
def jl_distance_audit(spark, sf_dir):
    """JL 64->16 projection distance-preservation audit vs vec 0."""
    import os

    from lucenenet_spark.functions.similarity import jl_distance_audit as _jl

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return _jl(emb, d_out=_JL_DOUT, n_pairs=_JL_PAIRS)


# ----------------------------------------------------------------------
# combmnz_fusion — Fox & Shaw TREC-2 1994: min-max-normalized score sum
# times the retrieving-system count, over the BM25 and Classic top-10
# for one query (the score-aware sibling of rrf_hybrid_topk).
# ----------------------------------------------------------------------
_CMNZ_TERM = "vector"
_CMNZ_K = 10


def _cmnz_sql() -> str:
    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
ra2 AS (
  SELECT doc_id, score_q,
         row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_CMNZ_TERM)})
  ) QUALIFY rank <= {_CMNZ_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_CMNZ_TERM}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb2 AS (
  SELECT doc_id, score_q,
         row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{_CMNZ_TERM}'
  ) QUALIFY rank <= {_CMNZ_K}
),
mma AS (SELECT min(score_q) AS lo, max(score_q) AS hi FROM ra2),
mmb AS (SELECT min(score_q) AS lo, max(score_q) AS hi FROM rb2),
na AS (
  SELECT doc_id,
         CASE WHEN mma.hi = mma.lo THEN 1.0
              ELSE CAST(score_q - mma.lo AS DOUBLE) / CAST(mma.hi - mma.lo AS DOUBLE)
         END AS n_a
  FROM ra2, mma
),
nb AS (
  SELECT doc_id,
         CASE WHEN mmb.hi = mmb.lo THEN 1.0
              ELSE CAST(score_q - mmb.lo AS DOUBLE) / CAST(mmb.hi - mmb.lo AS DOUBLE)
         END AS n_b
  FROM rb2, mmb
),
fu AS (
  SELECT coalesce(na.doc_id, nb.doc_id) AS doc_id,
         coalesce(n_a, 0.0) AS n_a, coalesce(n_b, 0.0) AS n_b,
         CAST((CASE WHEN na.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            + (CASE WHEN nb.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_systems
  FROM na FULL OUTER JOIN nb ON na.doc_id = nb.doc_id
)
SELECT CAST(row_number() OVER (
         ORDER BY CAST(floor(CAST(n_systems AS DOUBLE) * (n_a + n_b) * 1000000.0 + 0.5)
                  AS BIGINT) DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, n_systems,
       CAST(floor(CAST(n_systems AS DOUBLE) * (n_a + n_b) * 1000000.0 + 0.5) AS BIGINT)
         AS fused_q
FROM fu
"""
    )


@gate("combmnz_fusion", _cmnz_sql())
def combmnz_fusion(spark, sf_dir):
    """CombMNZ fusion of BM25 and Classic top-10 for one query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.hybrid import combmnz_fusion as _cmnz
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_CMNZ_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return scored.withColumn("rank", F.row_number().over(w))

    return _cmnz(_ranked(searcher), _ranked(classic), k=_CMNZ_K)
