"""Gate registry round-5 part z: link-spam mass estimation — the
adversarial-web companion to pagerank_topk / personalized_pagerank.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate
from lucenenet_spark.plans.gate_round5t import (
    _GRAPH_CTES,
    _PPR_MOD,
    _PR_D,
    _PR_ITERS,
)

# ----------------------------------------------------------------------
# spam_mass — Gyöngyi VLDB'06 relative spam mass: (p - p'·s/n)/p with
# p = classic PageRank, p' = the trusted-core PPR (teleport 1/|S| on
# doc_id % 10 == 0), scaled by s/n AFTER the iterations in the exact
# same operation order as the Spark side (PageRank is linear in the
# teleport vector, so this equals the paper's 1/n-per-seed p').
# Oracle unrolls BOTH 5-iteration chains.
# ----------------------------------------------------------------------
_SM_K = 20


def _spam_mass_sql() -> str:
    tele = 1.0 - _PR_D
    r_iters = []
    q_iters = []
    for k in range(1, _PR_ITERS + 1):
        r_iters.append(f"""
r{k} AS (
  SELECT nd.doc_id,
         {tele!r} * (1.0 / nn.n) + {_PR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(r.pr / e.deg) AS m
    FROM edges e JOIN r{k - 1} r ON r.doc_id = e.src GROUP BY e.dst
  ) c USING (doc_id)
  CROSS JOIN nn
)""")
        q_iters.append(f"""
q{k} AS (
  SELECT t.doc_id,
         {tele!r} * t.tp + {_PR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM tp t
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(r.pr / e.deg) AS m
    FROM edges e JOIN q{k - 1} r ON r.doc_id = e.src GROUP BY e.dst
  ) c USING (doc_id)
)""")
    return f"""
WITH {_GRAPH_CTES},
r0 AS (SELECT nd.doc_id, 1.0 / nn.n AS pr FROM nodes nd CROSS JOIN nn),{",".join(r_iters)},
sc AS (SELECT CAST(count(*) AS BIGINT) AS s FROM nodes
       WHERE doc_id % {_PPR_MOD} = 0),
tp AS (
  SELECT nd.doc_id,
         CASE WHEN nd.doc_id % {_PPR_MOD} = 0 THEN 1.0 / sc.s
              ELSE 0.0 END AS tp
  FROM nodes nd CROSS JOIN sc
),
q0 AS (SELECT doc_id, tp AS pr FROM tp),{",".join(q_iters)}
SELECT p.doc_id,
       CAST(floor(p.pr * 10000000.0 + 0.5) AS BIGINT) AS pr_q,
       CAST(floor(
         (p.pr - q.pr * (CAST(sc.s AS DOUBLE) / CAST(nn.n AS DOUBLE))) / p.pr
         * 100000.0 + 0.5) AS BIGINT) AS sm_q5
FROM r{_PR_ITERS} p
JOIN q{_PR_ITERS} q USING (doc_id)
CROSS JOIN sc CROSS JOIN nn
ORDER BY sm_q5 DESC, doc_id ASC LIMIT {_SM_K}
"""


@gate("spam_mass", _spam_mass_sql())
def spam_mass(spark, sf_dir):
    """Top-20 link-spam suspects by relative spam mass."""
    from lucenenet_spark.functions.pagerank import spam_mass as _sm
    from lucenenet_spark.plans.gate import _docs_table

    return _sm(
        _docs_table(spark, sf_dir),
        trusted_mod=_PPR_MOD,
        damping=_PR_D,
        iterations=_PR_ITERS,
        k=_SM_K,
    )


# ----------------------------------------------------------------------
# query_segmentation — PMI/connexity query segmentation (Risvik 2003;
# Bergsma & Wang EMNLP'07 decision): split a 3-token query at gaps
# whose corpus PMI is non-positive, keep positively-associated pairs as
# phrases.  Queries = first 3 raw tokens of every 7th doc, so both
# query bigrams exist in the corpus bigram table by construction.
# ----------------------------------------------------------------------
_SEG_MOD = 7
_SEG_K = 25

_SEG_SQL = f"""
WITH tt AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM tt) GROUP BY w
),
tp AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT t FROM tt WHERE len(t) >= 2),
       unnest(generate_series(1, len(t) - 1)) AS u(i)
),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM tp GROUP BY w1, w2
),
tot AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS T,
         (SELECT CAST(sum(cb) AS BIGINT) FROM big) AS B
),
q AS (
  SELECT doc_id, t[1] AS w1, t[2] AS w2, t[3] AS w3
  FROM tt WHERE doc_id % {_SEG_MOD} = 0 AND len(t) >= 3
),
sc AS (
  SELECT q.doc_id, q.w1, q.w2, q.w3,
         CAST(floor(ln((CAST(b12.cb AS DOUBLE) / tot.B)
           / ((CAST(u1.c AS DOUBLE) / tot.T) * (CAST(u2.c AS DOUBLE) / tot.T)))
           * 1000000.0 + 0.5) AS BIGINT) AS pmi12_q,
         CAST(floor(ln((CAST(b23.cb AS DOUBLE) / tot.B)
           / ((CAST(u2.c AS DOUBLE) / tot.T) * (CAST(u3.c AS DOUBLE) / tot.T)))
           * 1000000.0 + 0.5) AS BIGINT) AS pmi23_q
  FROM q
  JOIN big b12 ON b12.w1 = q.w1 AND b12.w2 = q.w2
  JOIN big b23 ON b23.w1 = q.w2 AND b23.w2 = q.w3
  JOIN uni u1 ON u1.w = q.w1
  JOIN uni u2 ON u2.w = q.w2
  JOIN uni u3 ON u3.w = q.w3
  CROSS JOIN tot
)
SELECT doc_id, w1 || ' ' || w2 || ' ' || w3 AS query, pmi12_q, pmi23_q,
       w1 || (CASE WHEN pmi12_q > 0 THEN ' ' ELSE '|' END)
          || w2 || (CASE WHEN pmi23_q > 0 THEN ' ' ELSE '|' END) || w3
         AS segmentation
FROM sc ORDER BY doc_id ASC LIMIT {_SEG_K}
"""


@gate("query_segmentation", _SEG_SQL)
def query_segmentation(spark, sf_dir):
    """PMI-boundary segmentation of synthesized 3-token queries."""
    from lucenenet_spark.functions.textstats import segment_queries
    from lucenenet_spark.plans.gate import _docs_table

    return segment_queries(_docs_table(spark, sf_dir), query_mod=_SEG_MOD, k=_SEG_K)
