"""Gate registry round-5 part zg: TextRank keyword extraction and the
BM25+ lower-bounded ranking variant.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# textrank_keywords — Mihalcea & Tarau EMNLP'04: PageRank over the
# adjacency graph of content words (stop-filtered sequence, both
# directions, self-repeats dropped), 4 iterations at d=0.85.  Words
# map to dense ids by sorted-vocab rank so the verified pagerank loop
# runs unchanged; the oracle unrolls the same chain word-keyed.
# ----------------------------------------------------------------------
_TR_ITERS = 4
_TR_D = 0.85
_TR_K = 20


def _textrank_sql() -> str:
    tele = 1.0 - _TR_D
    iters = []
    for k in range(1, _TR_ITERS + 1):
        iters.append(f"""
r{k} AS (
  SELECT nd.wid,
         {tele!r} * (1.0 / vn.n) + {_TR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM wid nd
  LEFT JOIN (
    SELECT e.dst AS wid, sum(r.pr / e.deg) AS m
    FROM ew e JOIN r{k - 1} r ON r.wid = e.src GROUP BY e.dst
  ) c USING (wid)
  CROSS JOIN vn
)""")
    return (
        SQL_PRELUDE
        + f""",
seqd AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS seq
  FROM tokf
),
adj AS (
  SELECT a.term AS wa, b.term AS wb
  FROM seqd a JOIN seqd b ON b.doc_id = a.doc_id AND b.seq = a.seq + 1
  WHERE a.term <> b.term
),
und AS (
  SELECT DISTINCT wa, wb FROM (
    SELECT wa, wb FROM adj UNION ALL SELECT wb AS wa, wa AS wb FROM adj
  )
),
wid AS (
  SELECT word, CAST(row_number() OVER (ORDER BY word) - 1 AS BIGINT) AS wid
  FROM (SELECT DISTINCT wa AS word FROM und)
),
e AS (
  SELECT sa.wid AS src, sb.wid AS dst
  FROM und
  JOIN wid sa ON sa.word = und.wa
  JOIN wid sb ON sb.word = und.wb
),
dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
ew AS (SELECT e.src, e.dst, dg.deg FROM e JOIN dg USING (src)),
vn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wid),
r0 AS (SELECT wid.wid, 1.0 / vn.n AS pr FROM wid CROSS JOIN vn),{",".join(iters)}
SELECT w.word, CAST(floor(r.pr * 10000000.0 + 0.5) AS BIGINT) AS rank_q
FROM r{_TR_ITERS} r JOIN wid w USING (wid)
ORDER BY rank_q DESC, word ASC LIMIT {_TR_K}
"""
    )


@gate("textrank_keywords", _textrank_sql())
def textrank_keywords(spark, sf_dir):
    """Top-20 TextRank keywords over the corpus co-occurrence graph."""
    from lucenenet_spark.functions.textstats import textrank_keywords as _tr
    from lucenenet_spark.plans.gate import _docs_table

    return _tr(
        _docs_table(spark, sf_dir), iterations=_TR_ITERS, damping=_TR_D, k=_TR_K
    )


# ----------------------------------------------------------------------
# bm25plus_term — Lv & Zhai CIKM'11: BM25 with the delta=1.0 lower
# bound on the saturated tf component, fixing the long-document
# under-reward.  Same double-mode idf/norm arithmetic as the engine.
# ----------------------------------------------------------------------
_BP_TERM = "merge"
_BP_K1 = 1.2
_BP_B = 0.75
_BP_DELTA = 1.0

_BP_SQL = SQL_PRELUDE + f"""
SELECT p.doc_id,
       CAST(floor(
         ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5))
         * ({_BP_K1 + 1.0!r} * p.tf
            / (p.tf + {_BP_K1!r} * ({1.0 - _BP_B!r} + {_BP_B!r} * dl.dl / (cs.sttf / cs.n)))
            + {_BP_DELTA!r})
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = '{_BP_TERM}'
"""


@gate("bm25plus_term", _BP_SQL)
def bm25plus_term(spark, sf_dir):
    """BM25+ scores for all docs matching one term."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.similarities import bm25_plus_scored

    idx, _, _ = get_engine(spark, sf_dir)
    scored = bm25_plus_scored(idx, _BP_TERM, k1=_BP_K1, b=_BP_B, delta=_BP_DELTA)
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )
