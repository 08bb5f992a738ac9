"""Gate registry round-5 part zp: term-level MaxScore pruning and the
next-word phrase index.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _tsc,
    gate,
    get_engine,
)

# ----------------------------------------------------------------------
# maxscore_topk — Turtle & Flood IPM'95: integer max-impact prefix sums
# vs the kth-best single-term theta; result provably equals the
# unpruned OR (twin asserts that too).
# ----------------------------------------------------------------------
_MS_TERMS = ("vector", "merge", "query")
_MS_K = 10

_MS_CONTRIB = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, '{t}' AS term,"
    f" CAST(floor(score * 10000 + 0.5) AS BIGINT) AS c_q FROM ({_tsc(t)})"
    for t in _MS_TERMS
)

_MS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
contrib AS (
{_MS_CONTRIB}
),
kth AS (
  SELECT CAST(coalesce(max(c_q), 0) AS BIGINT) AS theta FROM (
    SELECT c_q, row_number() OVER (PARTITION BY term
                                   ORDER BY c_q DESC, doc_id ASC) AS r
    FROM contrib) WHERE r = {_MS_K}
),
maxi AS (SELECT term, CAST(max(c_q) AS BIGINT) AS m FROM contrib GROUP BY 1),
flags AS (
  SELECT term, m,
         CAST(sum(m) OVER (ORDER BY m ASC, term ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         k.theta
  FROM maxi, kth k
),
ess AS (SELECT term FROM flags WHERE cum >= theta),
ne AS (
  SELECT CAST(sum(CASE WHEN cum >= theta THEN 1 ELSE 0 END) AS BIGINT) AS n_essential
  FROM flags
),
cand AS (SELECT DISTINCT doc_id FROM contrib JOIN ess USING (term)),
tot AS (
  SELECT c.doc_id, CAST(sum(c.c_q) AS BIGINT) AS score_q
  FROM contrib c JOIN cand USING (doc_id) GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, score_q, ne.n_essential,
       CAST({len(_MS_TERMS)} AS BIGINT) AS n_terms
FROM tot, ne
QUALIFY rank <= {_MS_K}
"""


@gate("maxscore_topk", _MS_SQL)
def maxscore_topk(spark, sf_dir):
    """MaxScore-pruned OR top-10, rank-identical to the full OR."""
    from lucenenet_spark.search.accumulators import maxscore_topk as _ms

    _, s, _ = get_engine(spark, sf_dir)
    return _ms(s, _MS_TERMS, k=_MS_K)


# ----------------------------------------------------------------------
# nextword_phrase — Williams, Zobel & Bahle TOIS'04 next-word index:
# phrase "order fast" served from the materialized (w1, w2, doc,
# pair_tf) table; BM25 phrase kernel with summed idf.
# ----------------------------------------------------------------------
_NW_W1 = "order"
_NW_W2 = "fast"
_NW_K = 10

_NW_SQL = SQL_PRELUDE + f""",
pairtf AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS pair_tf
  FROM (SELECT doc_id, pos FROM tokf WHERE term = '{_NW_W1}') a
  JOIN (SELECT doc_id, pos FROM tokf WHERE term = '{_NW_W2}') b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1
),
wv AS (
  SELECT (SELECT ln(1 + (cs.n - df + 0.5) / (df + 0.5)) FROM ts, cs
          WHERE term = '{_NW_W1}')
       + (SELECT ln(1 + (cs.n - df + 0.5) / (df + 0.5)) FROM ts, cs
          WHERE term = '{_NW_W2}') AS w
),
sc AS (
  SELECT p.doc_id, p.pair_tf,
         CAST(floor(
           wv.w * 2.2 * p.pair_tf
           / (p.pair_tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.n2 / cs.nn)))
           * 10000 + 0.5) AS BIGINT) AS score_q
  FROM pairtf p
  JOIN dl USING (doc_id)
  CROSS JOIN wv
  CROSS JOIN (SELECT sttf AS n2, n AS nn FROM cs) cs
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, pair_tf, score_q
FROM sc
QUALIFY rank <= {_NW_K}
"""


@gate("nextword_phrase", _NW_SQL)
def nextword_phrase(spark, sf_dir):
    """Phrase 'order fast' top-10 from the next-word index."""
    from lucenenet_spark.index.nextword import (
        build_nextword_index,
        nextword_phrase_topk,
    )

    idx, _, _ = get_engine(spark, sf_dir)
    nw = build_nextword_index(idx, firstwords=[_NW_W1])
    return nextword_phrase_topk(idx, nw, _NW_W1, _NW_W2, k=_NW_K)
