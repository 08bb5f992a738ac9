"""Gate registry round-5 part zl: elastic-serving routing and classical
LM smoothing — consistent-hash rebalance audit and interpolated
Kneser-Ney bigram scoring.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _docs_table, gate
from lucenenet_spark.search.sharded import _hash_ring

# ----------------------------------------------------------------------
# consistent_hash_rebalance — Karger STOC'97 ring routing, N=4 -> N=5:
# every moved doc must land on the new shard.  Ring points are
# Python-md5 literals reproduced verbatim in both engines (the
# ann_lsh_topk plane-literal discipline); doc positions are the shared
# 32-bit md5 integer convention.
# ----------------------------------------------------------------------
_CHR_NS = 4
_CHR_VN = 16

_RING_B = _hash_ring(_CHR_NS, _CHR_VN)
_RING_A = _hash_ring(_CHR_NS + 1, _CHR_VN)

_DOC_H = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j + 1}, 1)) - 1)"
    f" * {16 ** (7 - j)}"
    for j in range(8)
)


def _ring_sql(ring, alias):
    vals = ", ".join(f"({p}, {s})" for p, s in ring)
    return f"{alias}(pos, shard) AS (SELECT * FROM (VALUES {vals}))"


_CHR_SQL = f"""
WITH dh AS (
  SELECT doc_id, {_DOC_H} AS h FROM documents
),
{_ring_sql(_RING_B, "ring_b")},
{_ring_sql(_RING_A, "ring_a")},
asg_b AS (
  SELECT d.doc_id,
         coalesce(min(CASE WHEN r.pos >= d.h THEN r.pos END), {_RING_B[0][0]}) AS pos
  FROM dh d CROSS JOIN ring_b r GROUP BY d.doc_id
),
asg_a AS (
  SELECT d.doc_id,
         coalesce(min(CASE WHEN r.pos >= d.h THEN r.pos END), {_RING_A[0][0]}) AS pos
  FROM dh d CROSS JOIN ring_a r GROUP BY d.doc_id
),
j AS (
  SELECT b.doc_id, rb.shard AS s_before, ra.shard AS s_after
  FROM asg_b b
  JOIN ring_b rb ON rb.pos = b.pos
  JOIN asg_a a ON a.doc_id = b.doc_id
  JOIN ring_a ra ON ra.pos = a.pos
),
fs AS (
  SELECT s_before AS shard_id, CAST(count(*) AS BIGINT) AS docs_before,
         CAST(sum(CASE WHEN s_before <> s_after THEN 1 ELSE 0 END) AS BIGINT) AS moved_out
  FROM j GROUP BY 1
),
ts AS (
  SELECT s_after AS shard_id, CAST(count(*) AS BIGINT) AS docs_after
  FROM j GROUP BY 1
)
SELECT CAST(coalesce(fs.shard_id, ts.shard_id) AS BIGINT) AS shard_id,
       CAST(coalesce(docs_before, 0) AS BIGINT) AS docs_before,
       CAST(coalesce(docs_after, 0) AS BIGINT) AS docs_after,
       CAST(coalesce(moved_out, 0) AS BIGINT) AS moved_out
FROM fs FULL OUTER JOIN ts USING (shard_id)
"""


@gate("consistent_hash_rebalance", _CHR_SQL)
def consistent_hash_rebalance(spark, sf_dir):
    """Per-shard before/after/moved audit of growing the ring 4 -> 5."""
    from lucenenet_spark.search.sharded import consistent_hash_rebalance as _chr

    return _chr(_docs_table(spark, sf_dir), n_shards=_CHR_NS, vnodes=_CHR_VN)


# ----------------------------------------------------------------------
# kneser_ney_bigram — interpolated KN (Kneser & Ney ICASSP'95, Chen &
# Goodman'98 §2.7) over raw whitespace bigrams; doc_id % 7 == 0 docs
# scored against the full-corpus count tables.  Per-pair ln P quantized
# q6 BEFORE the per-doc sum: integers all the way.
# ----------------------------------------------------------------------
_KN_MOD = 7
_KN_D = 0.75

_KN_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toks, unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM pairs GROUP BY 1, 2),
ctx AS (
  SELECT w1, CAST(sum(cb) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f
  FROM big GROUP BY 1
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM big GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM big),
sc AS (
  SELECT t.doc_id,
    CAST(floor(ln(
      greatest(CAST(coalesce(b.cb, 0) AS DOUBLE) - {d!r}, 0.0) / CAST(c.c1 AS DOUBLE)
      + ({d!r} * CAST(c.n1f AS DOUBLE) / CAST(c.c1 AS DOUBLE))
        * (CAST(coalesce(o.n1b, 0) AS DOUBLE) / CAST(n.nt AS DOUBLE))
    ) * 1000000.0 + 0.5) AS BIGINT) AS lp_q6
  FROM (SELECT * FROM pairs WHERE doc_id % {m} = 0) t
  LEFT JOIN big b USING (w1, w2)
  JOIN ctx c USING (w1)
  LEFT JOIN cont o USING (w2)
  CROSS JOIN nt n
  WHERE coalesce(b.cb, 0) > 0 OR coalesce(o.n1b, 0) > 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(lp_q6) AS BIGINT) AS sum_lp_q6
FROM sc GROUP BY doc_id
""".format(d=_KN_D, m=_KN_MOD)


@gate("kneser_ney_bigram", _KN_SQL)
def kneser_ney_bigram(spark, sf_dir):
    """Interpolated-KN per-doc bigram logprob sums, q6-exact."""
    import pyspark.sql.functions as F

    from lucenenet_spark.functions.lm_quality import kneser_ney_bigram_logprob

    docs = _docs_table(spark, sf_dir)
    return kneser_ney_bigram_logprob(
        docs.filter(F.col("doc_id") % _KN_MOD == 0), train=docs, discount=_KN_D
    )
