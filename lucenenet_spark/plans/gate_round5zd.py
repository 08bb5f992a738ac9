"""Gate registry round-5 part zd: SALSA link analysis and the BM25
(k1, b) tuning sweep.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, gate, get_engine
from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES

# ----------------------------------------------------------------------
# salsa_topk — Lempel & Moran WWW'00: authority random walk
# (back-step over in-links, forward-step over out-links), stochastic so
# unnormalized; 3 iterations from uniform.  Oracle unrolls both half-
# steps per iteration with the identical join/agg arithmetic.
# ----------------------------------------------------------------------
_SALSA_ITERS = 3
_SALSA_K = 20


def _salsa_sql() -> str:
    steps = []
    for k in range(1, _SALSA_ITERS + 1):
        steps.append(f"""
b{k} AS (
  SELECT e.src, sum(a.a / e.ind) AS b
  FROM ei e JOIN a{k - 1} a ON a.doc_id = e.dst GROUP BY e.src
),
f{k} AS (
  SELECT e.dst AS doc_id, sum(b.b / e.deg) AS anew
  FROM ei e JOIN b{k} b ON b.src = e.src GROUP BY e.dst
),
a{k} AS (
  SELECT nd.doc_id, coalesce(f.anew, 0.0) AS a
  FROM nodes nd LEFT JOIN f{k} f USING (doc_id)
)""")
    return f"""
WITH {_GRAPH_CTES},
ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS ind FROM edges GROUP BY dst),
ei AS (SELECT e.src, e.dst, e.deg, i.ind FROM edges e JOIN ind i USING (dst)),
a0 AS (SELECT nd.doc_id, 1.0 / nn.n AS a FROM nodes nd CROSS JOIN nn),{",".join(steps)}
SELECT doc_id, CAST(floor(a * 10000000.0 + 0.5) AS BIGINT) AS auth_q
FROM a{_SALSA_ITERS}
ORDER BY auth_q DESC, doc_id ASC LIMIT {_SALSA_K}
"""


@gate("salsa_topk", _salsa_sql())
def salsa_topk(spark, sf_dir):
    """Top-20 SALSA authorities over the deterministic link graph."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, salsa
    from lucenenet_spark.plans.gate import _docs_table

    nodes = _docs_table(spark, sf_dir).select("doc_id")
    a = salsa(nodes, build_link_graph(nodes), iterations=_SALSA_ITERS)
    return (
        a.select(
            "doc_id",
            F.floor(F.col("a") * F.lit(10000000.0) + F.lit(0.5))
            .cast("long")
            .alias("auth_q"),
        )
        .orderBy(F.col("auth_q").desc(), F.col("doc_id").asc())
        .limit(_SALSA_K)
    )


# ----------------------------------------------------------------------
# bm25_param_sweep — nDCG@10 of four (k1, b) combinations against the
# shared graded qrels; per-combo score formula replicated with the
# exact double-mode operation order (idf*(k1+1) weight, k1*((1-b) +
# b*dl/avgdl) norm).
# ----------------------------------------------------------------------
_SWEEP_TERM = "vector"
_SWEEP_K = 10
_SWEEP_G = 4
_SWEEP_GRID = ((1.2, 0.75), (0.9, 0.4), (1.6, 0.75), (1.2, 0.2))


def _sweep_sql() -> str:
    contrib = (
        "CAST(floor((pow(2.0, grade) - 1.0)"
        " / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)) * 1000000000.0 + 0.5)"
        " AS BIGINT)"
    )
    combos = []
    for k1, b in _SWEEP_GRID:
        tag = f"{int(round(k1 * 100))}_{int(round(b * 100))}"
        combos.append(f"""
sc_{tag} AS (
  SELECT p.doc_id,
         (ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * {k1 + 1.0!r}) * p.tf
           / (p.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / (cs.sttf / cs.n)))
           AS score
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term = '{_SWEEP_TERM}'
),
ranked_{tag} AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM sc_{tag}
  )
),
run_{tag} AS (
  SELECT {contrib} AS cq
  FROM ranked_{tag} JOIN g USING (doc_id) WHERE rank <= {_SWEEP_K}
),
row_{tag} AS (
  SELECT CAST({int(round(k1 * 100))} AS BIGINT) AS k1_q2,
         CAST({int(round(b * 100))} AS BIGINT) AS b_q2,
         (SELECT CAST(sum(cq) AS BIGINT) FROM run_{tag}) AS dcg_q9,
         (SELECT CAST(sum(cq) AS BIGINT) FROM ideal) AS idcg_q9
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM row_{int(round(k1 * 100))}_{int(round(b * 100))}"
        for k1, b in _SWEEP_GRID
    )
    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
g AS (
  SELECT doc_id, CAST(least(tf, {_SWEEP_G}) AS BIGINT) AS grade
  FROM post WHERE term = '{_SWEEP_TERM}'
),
ideal AS (
  SELECT {contrib} AS cq
  FROM (
    SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id ASC) AS rank
    FROM g
  ) WHERE rank <= {_SWEEP_K}
),{",".join(combos)}
SELECT k1_q2, b_q2, dcg_q9, idcg_q9,
       CAST(floor(CAST(dcg_q9 AS DOUBLE) / CAST(idcg_q9 AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS ndcg_q
FROM ({union})
"""
    )


@gate("bm25_param_sweep", _sweep_sql())
def bm25_param_sweep(spark, sf_dir):
    """nDCG@10 across four BM25 (k1, b) combinations."""
    from lucenenet_spark.search.quality import bm25_param_sweep as _sweep

    idx, _, _ = get_engine(spark, sf_dir)
    return _sweep(idx, _SWEEP_TERM, grid=_SWEEP_GRID, k=_SWEEP_K, max_grade=_SWEEP_G)
