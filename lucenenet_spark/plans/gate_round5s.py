"""Gate registry round-5 part s: SemDeDup semantic deduplication
(Abbas et al. 2023) — trained-k-means-bounded within-cluster cosine
dedup over the embeddings table, keep-farthest-from-centroid.
"""

from __future__ import annotations

import os

from lucenenet_spark.plans.gate import gate

_SD_CELLS = 16
_SD_SEED = 7
_SD_THRESH = 0.35
_SD_Q = 10000


def _semdedup_sql() -> str:
    """Survivor set with embedded trained-centroid literals: argmax-raw-dot
    cell assignment (ties to smallest cid), BIGINT-quantized cosine to the
    assigned unit-norm centroid as keep priority, within-cluster quantized
    pair cosine at the threshold boundary, anti-join of the beaten docs."""
    from lucenenet_spark.functions.similarity import trained_ivf_centroids

    cents = trained_ivf_centroids(_SD_CELLS, _SD_SEED)
    clits = [("[" + ", ".join(repr(float(x)) for x in c) + "]") for c in cents]
    cell_dots = ",\n         ".join(
        f"list_dot_product(v, {clits[c]}) AS d{c}" for c in range(_SD_CELLS)
    )
    g = "greatest(" + ", ".join(f"d{c}" for c in range(_SD_CELLS)) + ")"
    argmax = (
        "CASE "
        + " ".join(f"WHEN d{c} = {g} THEN {c}" for c in range(_SD_CELLS))
        + " END"
    )
    thresh_q = int(round(_SD_THRESH * _SD_Q))
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cells AS (
  SELECT vec_id, v,
         {cell_dots}
  FROM raw
),
assign AS (
  SELECT vec_id, v,
         {argmax} AS cid,
         CAST(floor({g} / sqrt(list_dot_product(v, v)) * {_SD_Q} + 0.5)
              AS BIGINT) AS csim_q
  FROM cells
),
removed AS (
  SELECT DISTINCT a.vec_id
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.vec_id <> b.vec_id
  WHERE (b.csim_q < a.csim_q
         OR (b.csim_q = a.csim_q AND b.vec_id < a.vec_id))
    AND CAST(floor(list_dot_product(a.v, b.v)
          / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
          * {_SD_Q} + 0.5) AS BIGINT) >= {thresh_q}
)
SELECT vec_id, cid, csim_q
FROM assign
WHERE vec_id NOT IN (SELECT vec_id FROM removed)
"""


@gate("semdedup_survivors", _semdedup_sql())
def semdedup_survivors(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): trained spherical-k-means cells bound
    the cosine pair join (N^2 -> N^2/k); within a cell, docs whose
    quantized cosine to a lower-centroid-similarity neighbour reaches 0.35
    are removed, keeping the farthest-from-centroid member of every
    duplicate relation. Survivors returned with their cell and quantized
    centroid similarity so assignment, priority, and removal are all
    oracle-checked."""
    from lucenenet_spark.functions.semdedup import semdedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return semdedup(emb, _SD_THRESH, n_cells=_SD_CELLS, seed=_SD_SEED)
