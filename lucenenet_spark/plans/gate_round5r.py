"""Gate registry part 5r: product-quantization ANN (IVFADC shape).

The third ANN scale path beside IVF-Flat (`ann_ivf_topk`) and hyperplane
LSH (`ann_lsh_topk`): per-subspace codebooks compress each vector to M
small codes, queries scan the integer code table via an ADC lookup table
and only the shortlist ever touches the float vectors (Jegou/Douze/Schmid,
TPAMI 2011 — the FAISS IVFADC deployment shape).

Oracle strategy mirrors `gate_round3b._ivf_sql`: the codebooks are trained
driver-side on the pinned reference sample with a seeded Lloyd loop, so the
same python-float literals embed into both the Spark Column expressions and
the DuckDB SQL; the ADC table is quantized to BIGINT in python BEFORE
embedding, making the shortlist ordering integer-exact across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F  # noqa: F401  (gate plans may use it)

from lucenenet_spark.plans.gate import gate

_PQ_M = 8
_PQ_KS = 16
_PQ_SEED = 11
_PQ_K = 10
_PQ_MULT = 4  # shortlist = k * mult = 40
_PQ_QID = 0


def _pq_sql() -> str:
    from lucenenet_spark.functions import pq as fpq

    books = fpq.trained_pq_codebooks(_PQ_M, _PQ_KS, _PQ_SEED)
    dsub = len(books[0][0])

    # Query ADC table is built from the query VECTOR, which the engine
    # reads from the table at runtime; the oracle needs the same table as
    # integer literals, so read the pinned query row the same way the
    # engine does (vec_id = _PQ_QID from the sf under test is NOT known
    # here — but the gate runner evaluates this SQL against the same
    # sf_dir parquet, so express the whole ADC pipeline in SQL instead of
    # embedding a query-dependent table).
    #
    # code assignment: per subspace mi, score_c = cc_c - 2 * dot(u_mi, c)
    # over the unit-normalized vector; argmin with ties to the smallest
    # code (CASE first-match == Spark's coalesce-of-when).
    def sub_scores(mi: int, src: str) -> list[str]:
        lo = mi * dsub + 1
        hi = mi * dsub + dsub
        out = []
        for cent in books[mi]:
            lit = "[" + ", ".join(repr(float(v)) for v in cent) + "]"
            cc = repr(float(sum(v * v for v in cent)))
            out.append(
                f"({cc} - 2.0 * list_dot_product({src}[{lo}:{hi}], {lit}))"
            )
        return out

    def code_expr(mi: int, src: str) -> str:
        ss = sub_scores(mi, src)
        least = "least(" + ", ".join(ss) + ")"
        case = "CASE " + " ".join(
            f"WHEN {ss[c]} = {least} THEN {c}" for c in range(len(ss))
        ) + " END"
        return case

    corpus_codes = ",\n         ".join(
        f"{code_expr(mi, 'ul')} AS code{mi}" for mi in range(_PQ_M)
    )

    # Query-side ADC table, entirely in SQL: per subspace the 16 quantized
    # distances floor(||q_mi - c||^2 * 1e4 + 0.5) as a BIGINT list literal
    # indexed by the corpus code.  ||q - c||^2 = qq + cc - 2*dot; qq is the
    # subspace self-dot of the unit query (runtime value), cc/dot use the
    # embedded centroid literals — identical arithmetic to
    # fpq.pq_distance_table_q up to the shared fold order.
    def adc_term(mi: int) -> str:
        lo = mi * dsub + 1
        hi = mi * dsub + dsub
        cells = []
        for cent in books[mi]:
            lit = "[" + ", ".join(repr(float(v)) for v in cent) + "]"
            cc = repr(float(sum(v * v for v in cent)))
            d2 = (
                f"(list_dot_product(qu[{lo}:{hi}], qu[{lo}:{hi}])"
                f" + {cc} - 2.0 * list_dot_product(qu[{lo}:{hi}], {lit}))"
            )
            cells.append(f"CAST(floor({d2} * 10000.0 + 0.5) AS BIGINT)")
        return f"([{', '.join(cells)}])[code{mi} + 1]"

    adc_sum = " + ".join(adc_term(mi) for mi in range(_PQ_M))

    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
),
unitv AS (
  SELECT vec_id,
         list_transform(
           ed,
           x -> CASE WHEN sqrt(list_dot_product(ed, ed)) > 0
                     THEN x / sqrt(list_dot_product(ed, ed))
                     ELSE 0.0 END) AS ul
  FROM raw
),
codes AS (
  SELECT vec_id,
         {corpus_codes}
  FROM unitv
),
qunit AS (SELECT ul AS qu FROM unitv WHERE vec_id = {_PQ_QID}),
shortlist AS (
  SELECT vec_id, ({adc_sum}) AS adc_q
  FROM codes, qunit
  ORDER BY adc_q ASC, vec_id ASC
  LIMIT {_PQ_K * _PQ_MULT}
),
e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings JOIN shortlist USING (vec_id)
),
qe AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {_PQ_QID}
),
d AS (
  SELECT e.vec_id, sum(e.v * qe.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN qe USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qe)
SELECT d.vec_id,
       CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) AS cos_q
FROM d, qn
ORDER BY cos_q DESC, d.vec_id ASC LIMIT {_PQ_K}
"""


_IVFPQ_CELLS = 16
_IVFPQ_PROBE = 2
_IVFPQ_SEED = 7


def _ivfpq_sql() -> str:
    """True IVFADC: the PQ oracle restricted to the query's top-nprobe
    trained IVF cells. Cell assignment is argmax RAW dot (ties to smallest
    cid) — similarity.ivf_assign's convention — while codes/ADC run over
    the unit-normalized vectors, both with embedded trained literals."""
    from lucenenet_spark.functions import pq as fpq
    from lucenenet_spark.functions import similarity as fsim

    cents = fsim.trained_ivf_centroids(_IVFPQ_CELLS, _IVFPQ_SEED)
    books = fpq.trained_pq_codebooks(_PQ_M, _PQ_KS, _PQ_SEED)
    dsub = len(books[0][0])
    clits = [("[" + ", ".join(repr(float(x)) for x in c) + "]") for c in cents]
    cell_dots = ",\n         ".join(
        f"list_dot_product(ed, {clits[c]}) AS d{c}" for c in range(_IVFPQ_CELLS)
    )
    g = "greatest(" + ", ".join(f"d{c}" for c in range(_IVFPQ_CELLS)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN d{c} = {g} THEN {c}" for c in range(_IVFPQ_CELLS)
    ) + " END"
    cent_values = ",\n    ".join(f"({c}, {clits[c]})" for c in range(_IVFPQ_CELLS))

    def code_expr(mi: int) -> str:
        lo = mi * dsub + 1
        hi = mi * dsub + dsub
        ss = []
        for cent in books[mi]:
            lit = "[" + ", ".join(repr(float(v)) for v in cent) + "]"
            cc = repr(float(sum(v * v for v in cent)))
            ss.append(f"({cc} - 2.0 * list_dot_product(ul[{lo}:{hi}], {lit}))")
        least = "least(" + ", ".join(ss) + ")"
        return "CASE " + " ".join(
            f"WHEN {ss[c]} = {least} THEN {c}" for c in range(len(ss))
        ) + " END"

    corpus_codes = ",\n         ".join(
        f"{code_expr(mi)} AS code{mi}" for mi in range(_PQ_M)
    )

    def adc_term(mi: int) -> str:
        lo = mi * dsub + 1
        hi = mi * dsub + dsub
        cells = []
        for cent in books[mi]:
            lit = "[" + ", ".join(repr(float(v)) for v in cent) + "]"
            cc = repr(float(sum(v * v for v in cent)))
            d2 = (
                f"(list_dot_product(qu[{lo}:{hi}], qu[{lo}:{hi}])"
                f" + {cc} - 2.0 * list_dot_product(qu[{lo}:{hi}], {lit}))"
            )
            cells.append(f"CAST(floor({d2} * 10000.0 + 0.5) AS BIGINT)")
        return f"([{', '.join(cells)}])[code{mi} + 1]"

    adc_sum = " + ".join(adc_term(mi) for mi in range(_PQ_M))

    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ed FROM embeddings
),
cent(cid, cv) AS (VALUES
    {cent_values}
),
cells AS (
  SELECT vec_id,
         {cell_dots}
  FROM raw
),
assign AS (SELECT vec_id, {argmax} AS cid FROM cells),
qraw AS (SELECT ed AS q FROM raw WHERE vec_id = {_PQ_QID}),
probe AS (
  SELECT cid FROM cent, qraw
  ORDER BY list_dot_product(cv, q) DESC, cid ASC LIMIT {_IVFPQ_PROBE}
),
unitv AS (
  SELECT vec_id,
         list_transform(
           ed,
           x -> CASE WHEN sqrt(list_dot_product(ed, ed)) > 0
                     THEN x / sqrt(list_dot_product(ed, ed))
                     ELSE 0.0 END) AS ul
  FROM raw JOIN assign USING (vec_id)
  WHERE assign.cid IN (SELECT cid FROM probe)
),
codes AS (
  SELECT vec_id,
         {corpus_codes}
  FROM unitv
),
qunit AS (
  SELECT list_transform(
           q, x -> CASE WHEN sqrt(list_dot_product(q, q)) > 0
                        THEN x / sqrt(list_dot_product(q, q))
                        ELSE 0.0 END) AS qu
  FROM qraw
),
shortlist AS (
  SELECT vec_id, ({adc_sum}) AS adc_q
  FROM codes, qunit
  ORDER BY adc_q ASC, vec_id ASC
  LIMIT {_PQ_K * _PQ_MULT}
),
e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings JOIN shortlist USING (vec_id)
),
qe AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {_PQ_QID}
),
d AS (
  SELECT e.vec_id, sum(e.v * qe.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN qe USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qe)
SELECT d.vec_id,
       CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) AS cos_q
FROM d, qn
ORDER BY cos_q DESC, d.vec_id ASC LIMIT {_PQ_K}
"""


@gate("ann_ivfpq_topk", _ivfpq_sql())
def ann_ivfpq_topk(spark, sf_dir):
    """True IVFADC (FAISS IVFPQ, by_residual=false): trained coarse cells
    route the scan (probe 2 of 16), trained PQ codes shortlist within the
    probed cells via the integer ADC table, exact quantized-cosine re-rank
    of the bounded shortlist."""
    from lucenenet_spark.functions import pq as fpq

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return fpq.ivfpq_topk(
        emb,
        query_vec_id=_PQ_QID,
        k=_PQ_K,
        n_cells=_IVFPQ_CELLS,
        nprobe=_IVFPQ_PROBE,
        ivf_seed=_IVFPQ_SEED,
        m=_PQ_M,
        ks=_PQ_KS,
        pq_seed=_PQ_SEED,
        shortlist_mult=_PQ_MULT,
    )


@gate("pq_adc_topk", _pq_sql())
def pq_adc_topk(spark, sf_dir):
    """PQ-ADC ANN (IVFADC shape): trained per-subspace codebooks encode
    every vector to M=8 codes; the query builds an integer ADC lookup
    table, the shortlist is a codes-only TakeOrdered scan, and only the
    40 shortlist rows are re-ranked by exact quantized cosine."""
    from lucenenet_spark.functions import pq as fpq

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return fpq.pq_topk(
        emb,
        query_vec_id=_PQ_QID,
        k=_PQ_K,
        m=_PQ_M,
        ks=_PQ_KS,
        seed=_PQ_SEED,
        shortlist_mult=_PQ_MULT,
    )
