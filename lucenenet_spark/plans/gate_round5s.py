"""Gate registry round-5 part s: SemDeDup semantic deduplication
(Abbas et al. 2023) — trained-k-means-bounded within-cluster cosine
dedup over the embeddings table, keep-farthest-from-centroid — and
ExactSubstr duplicated-span removal (Lee et al. 2021) — keep-first
rewrite of duplicated 10-token spans over the documents table.
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


_ES_N = 10


def _substr_dedup_sql() -> str:
    """Byte-for-byte rewrite oracle: positional md5 10-gram windows,
    row_number keep-first per duplicated gram, loser coverage expansion,
    kept-token reassembly with string_agg ORDER BY idx."""
    n = _ES_N
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS start,
         md5(array_to_string(t[i + 1 : i + {n}], ' ')) AS g
  FROM toks, unnest(generate_series(0, len(t) - {n})) AS u(i)
  WHERE len(t) >= {n}
),
ranked AS (
  SELECT doc_id, start,
         row_number() OVER (PARTITION BY g ORDER BY doc_id, start) AS rn,
         count(*) OVER (PARTITION BY g) AS occ
  FROM grams
),
losers AS (SELECT doc_id, start FROM ranked WHERE occ >= 2 AND rn > 1),
covered AS (
  SELECT DISTINCT doc_id, idx
  FROM losers, unnest(generate_series(start, start + {n - 1})) AS c(idx)
),
tk AS (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS idx, unnest(t) AS tok
  FROM toks
),
kept AS (
  SELECT tk.doc_id, tk.idx, tk.tok FROM tk
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = tk.doc_id AND c.idx = tk.idx
  )
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(reb.text_clean, '') AS text_clean,
       CAST(len(string_split(d.text, ' ')) - coalesce(reb.n_kept, 0) AS BIGINT)
         AS removed
FROM documents d LEFT JOIN reb USING (doc_id)
"""


@gate("substring_dedup_rewrite", _substr_dedup_sql())
def substring_dedup_rewrite(spark, sf_dir):
    """ExactSubstr span dedup (Lee et al. 2021, arXiv:2107.06499, fixed-n
    gram formulation): every duplicated 10-token span keeps its corpus-
    first occurrence and is cut from all others; documents are rewritten
    in place, never dropped. The keep-one DEDUP semantics — the sibling
    gate strip_dup_spans is the strip-ALL boilerplate-removal variant.
    Oracle reproduces the rewrite byte-for-byte including the keep-first
    tie-break and the removed-token counts."""
    from lucenenet_spark.functions.substrdedup import remove_duplicate_spans
    from lucenenet_spark.plans.gate import _docs_table

    return remove_duplicate_spans(_docs_table(spark, sf_dir), n=_ES_N)


_RRF_TERM = "vector"
_RRF_QID = 0
_RRF_KEACH = 20
_RRF_K = 60
_RRF_TOPK = 10


def _rrf_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc

    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
lex AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC, doc_id ASC
         ) AS lr
  FROM ({_tsc(_RRF_TERM)})
  ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC, doc_id ASC
  LIMIT {_RRF_KEACH}
),
e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
qe AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = {_RRF_QID}
),
cosd AS (
  SELECT e.vec_id, sum(e.v * qe.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN qe USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qe),
sem AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (
           ORDER BY CAST(floor(dot / sqrt(cosd.n2 * qn.n2) * 10000 + 0.5)
                         AS BIGINT) DESC, vec_id ASC
         ) AS sr
  FROM cosd, qn
  ORDER BY CAST(floor(dot / sqrt(cosd.n2 * qn.n2) * 10000 + 0.5)
                AS BIGINT) DESC, vec_id ASC
  LIMIT {_RRF_KEACH}
),
fused AS (
  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
         CAST(floor(
           (coalesce(1.0 / ({_RRF_K}.0 + lr), 0.0)
            + coalesce(1.0 / ({_RRF_K}.0 + sr), 0.0)) * 10000000 + 0.5
         ) AS BIGINT) AS rrf_q,
         CAST(coalesce(lr, 0) AS BIGINT) AS rank_0,
         CAST(coalesce(sr, 0) AS BIGINT) AS rank_1
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, rrf_q, rank_0, rank_1 FROM fused
ORDER BY rrf_q DESC, doc_id ASC LIMIT {_RRF_TOPK}
"""
    )


@gate("rrf_hybrid_topk", _rrf_sql())
def rrf_hybrid_topk(spark, sf_dir):
    """Hybrid lexical+vector retrieval (Cormack et al. SIGIR'09 RRF, the
    Elasticsearch/Vespa hybrid-search shape): BM25 top-20 for term
    'vector' fused with exact-cosine top-20 for the row-aligned stored
    embedding of doc 0 via 1/(60+rank), both rank assignments on
    quantized scores with doc-id tie-breaks."""
    import os

    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.hybrid import rrf_hybrid_topk as _rrf

    _, searcher, _ = get_engine(spark, sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return _rrf(
        searcher, emb, _RRF_TERM, _RRF_QID,
        k_each=_RRF_KEACH, rrf_k=_RRF_K, topk=_RRF_TOPK,
    )


_PRF_TERM = "vector"
_PRF_FBDOCS = 10
_PRF_FBTERMS = 5
_PRF_BETA = 0.3
_PRF_K = 10


def _rocchio_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc

    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f""",
fb AS (
  SELECT doc_id FROM ({_tsc(_PRF_TERM)})
  ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC, doc_id ASC
  LIMIT {_PRF_FBDOCS}
),
exp AS (
  SELECT term FROM post JOIN fb USING (doc_id)
  WHERE term <> '{_PRF_TERM}'
  GROUP BY term
  ORDER BY sum(tf) DESC, term ASC
  LIMIT {_PRF_FBTERMS}
),
orig AS ({_tsc(_PRF_TERM)}),
expsc AS (
  SELECT doc_id, sum((idf * {_PRF_BETA!r}) * 2.2 * tf / (tf + nrm)) AS score
  FROM sc JOIN exp USING (term) GROUP BY doc_id
),
final AS (
  SELECT coalesce(o.doc_id, x.doc_id) AS doc_id,
         coalesce(o.score, 0.0) + coalesce(x.score, 0.0) AS score
  FROM orig o FULL OUTER JOIN expsc x ON o.doc_id = x.doc_id
)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM final
ORDER BY score_q DESC, doc_id ASC LIMIT {_PRF_K}
"""
    )


@gate("rocchio_prf_topk", _rocchio_sql())
def rocchio_prf_topk(spark, sf_dir):
    """Rocchio/RM3 pseudo-relevance feedback: top-10 feedback docs for
    term 'vector', 5 heaviest feedback terms by integer tf sum (term
    tie-break), re-search with the expansion at beta=0.3 as boosted
    SHOULD clauses. Oracle recomputes feedback selection AND the expanded
    BM25 sum entirely in SQL."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.prf import rocchio_search

    idx, searcher, _ = get_engine(spark, sf_dir)
    return rocchio_search(
        idx, searcher, _PRF_TERM, k=_PRF_K,
        fb_docs=_PRF_FBDOCS, fb_terms=_PRF_FBTERMS, beta=_PRF_BETA,
    )


_MMR_QID = 0
_MMR_NCAND = 20
_MMR_K = 5
_MMR_L = 7  # lambda = 0.7


def _mmr_sql() -> str:
    """Unrolled greedy: cand = exact-cosine top-20, sims = pairwise
    quantized cosine over the candidate slice, then K step-CTEs each
    picking argmax(L*rel_q - (10-L)*max_sim_to_selected) with id
    tie-break — all BIGINT, zero float drift vs the driver greedy."""
    big_l, inv = _MMR_L, 10 - _MMR_L
    steps = []
    for n in range(1, _MMR_K + 1):
        if n == 1:
            steps.append(f"""
sel1 AS (
  SELECT vec_id, CAST({big_l} * rel_q AS BIGINT) AS mmr_q
  FROM cand ORDER BY {big_l} * rel_q DESC, vec_id ASC LIMIT 1
)""")
        else:
            prev = " UNION ALL ".join(
                f"SELECT vec_id FROM sel{m}" for m in range(1, n)
            )
            steps.append(f"""
pen{n} AS (
  SELECT c.vec_id, max(s.sim_q) AS p
  FROM cand c JOIN sims s ON s.id_a = c.vec_id
  WHERE s.id_b IN ({prev})
  GROUP BY c.vec_id
),
sel{n} AS (
  SELECT c.vec_id,
         CAST({big_l} * c.rel_q - {inv} * coalesce(p.p, 0) AS BIGINT) AS mmr_q
  FROM cand c LEFT JOIN pen{n} p USING (vec_id)
  WHERE c.vec_id NOT IN ({prev})
  ORDER BY mmr_q DESC, c.vec_id ASC LIMIT 1
)""")
    union = " UNION ALL ".join(
        f"SELECT CAST({n} AS INTEGER) AS step, vec_id, mmr_q FROM sel{n}"
        for n in range(1, _MMR_K + 1)
    )
    return f"""
WITH eall AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
qe AS (SELECT v, i FROM eall WHERE vec_id = {_MMR_QID}),
cosd AS (
  SELECT eall.vec_id, sum(eall.v * qe.v) AS dot, sum(eall.v * eall.v) AS n2
  FROM eall JOIN qe USING (i) GROUP BY eall.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qe),
cand AS (
  SELECT vec_id,
         CAST(floor(dot / sqrt(cosd.n2 * qn.n2) * 10000 + 0.5) AS BIGINT)
           AS rel_q
  FROM cosd, qn
  ORDER BY rel_q DESC, vec_id ASC LIMIT {_MMR_NCAND}
),
e2 AS (
  SELECT vec_id, v, i FROM eall
  WHERE vec_id IN (SELECT vec_id FROM cand)
),
nn AS (SELECT vec_id, sum(v * v) AS n2 FROM e2 GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
  FROM e2 a JOIN e2 b ON a.i = b.i AND a.vec_id <> b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
sims AS (
  SELECT id_a, id_b,
         CAST(floor(dot / sqrt(na.n2 * nb.n2) * 10000 + 0.5) AS BIGINT)
           AS sim_q
  FROM dots JOIN nn na ON na.vec_id = id_a JOIN nn nb ON nb.vec_id = id_b
),{",".join(steps)}
SELECT step, vec_id, mmr_q FROM ({union}) ORDER BY step
"""


@gate("mmr_diversified_topk", _mmr_sql())
def mmr_diversified_topk(spark, sf_dir):
    """MMR diversification (Carbonell & Goldstein SIGIR'98): exact-cosine
    top-20 candidates for stored vector 0, greedy re-rank to 5 with
    lambda=0.7 as all-integer arithmetic (7*rel_q - 3*max_sim_q, max over
    empty = 0, id tie-breaks). The oracle unrolls the 5 greedy steps as
    chained CTEs — selection order, ids, and MMR values all exact."""
    import os

    from lucenenet_spark.functions.mmr import mmr_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return mmr_topk(
        spark, emb, _MMR_QID,
        n_candidates=_MMR_NCAND, k=_MMR_K, lambda_tenths=_MMR_L,
    )


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
