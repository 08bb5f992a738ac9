"""Gate registry round-5 part zzg: blended-statistics SynonymQuery and
per-doc dynamic minimum-match (CoveringQuery) — two successor-engine
query types over the same BM25 kernel.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# synonym_query_blended — {row, line} scored as ONE pseudo-term:
# freq = tf_row + tf_line, df = max(df_row, df_line).  Contrast with the
# OR-of-terms score the synonym_or gate produces.
# ----------------------------------------------------------------------
_SY_TERMS = ("row", "line")
_SY_IN = ", ".join(f"'{t}'" for t in _SY_TERMS)

_SY_SQL = SQL_PRELUDE + f""",
syn AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tfs
  FROM post WHERE term IN ({_SY_IN}) GROUP BY doc_id
),
bl AS (SELECT max(df) AS dfm FROM ts WHERE term IN ({_SY_IN}))
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT s.doc_id,
         ln(1 + (cs.n - b.dfm + 0.5) / (b.dfm + 0.5)) * 2.2 * s.tfs
           / (s.tfs + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n))) AS score
  FROM syn s JOIN dl USING (doc_id), bl b, cs
)
ORDER BY score_q DESC, doc_id ASC LIMIT 15
"""


@gate("synonym_query_blended", _SY_SQL)
def synonym_query_blended(spark, sf_dir):
    """Top-15 for SynonymQuery(row, line) — blended df, summed tf."""
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import SynonymQuery

    _, s, _ = get_engine(spark, sf_dir)
    scored = _spark_score_q(s.scored(SynonymQuery(terms=_SY_TERMS)))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(15)


# ----------------------------------------------------------------------
# covering_query — clauses {scan, merge, stream}, per-doc threshold
# 1 + doc_id % 3 (the LongValuesSource), score = sum of the matching
# clauses' QUANTIZED scores (integer sum => associative => hash-stable).
# ----------------------------------------------------------------------
_CV_TERMS = ("scan", "merge", "stream")


def _qclause(term: str) -> str:
    return (
        f"SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS sq "
        f"FROM ({_tsc(term)})"
    )


_CV_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
uni AS (
  {_qclause(_CV_TERMS[0])}
  UNION ALL {_qclause(_CV_TERMS[1])}
  UNION ALL {_qclause(_CV_TERMS[2])}
),
cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(sq) AS BIGINT) AS score_q
  FROM uni GROUP BY doc_id
)
SELECT doc_id, n_matched, score_q
FROM cov WHERE n_matched >= 1 + (doc_id % 3)
ORDER BY score_q DESC, doc_id ASC LIMIT 20
"""


@gate("covering_query", _CV_SQL)
def covering_query(spark, sf_dir):
    """CoveringQuery(scan|merge|stream, minMatch = 1 + doc_id % 3)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.covering import covering_scored
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    quant = lambda c: F.floor(c * F.lit(10000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    out = covering_scored(
        s,
        [TermQuery(t) for t in _CV_TERMS],
        min_match=lambda doc: F.lit(1) + (doc % F.lit(3)),
        clause_transform=quant,
    )
    return (
        out.select("doc_id", "n_matched", F.col("score").cast("long").alias("score_q"))
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(20)
    )
