"""Gate registry round-5 part zzx: preference queries — skyline
(Pareto-optimal) documents and exact nearest-rank score percentiles.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_SK_TERM = "vector"

_SK_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
cand AS (
  SELECT s.doc_id, CAST(floor(s.score * 10000 + 0.5) AS BIGINT) AS score_q,
         CAST(d.n_chars AS BIGINT) AS n_chars
  FROM ({_tsc(_SK_TERM)}) s JOIN documents d USING (doc_id)
)
SELECT a.doc_id, a.score_q, a.n_chars
FROM cand a
WHERE NOT EXISTS (
  SELECT 1 FROM cand b
  WHERE b.score_q >= a.score_q AND b.n_chars <= a.n_chars
    AND (b.score_q > a.score_q OR b.n_chars < a.n_chars)
)
"""


@gate("skyline_docs", _SK_SQL)
def skyline_docs(spark, sf_dir):
    """Pareto frontier of docset(vector) on (score high, length low)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.collectors import skyline_docs as _sk
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    cand = (
        s.scored(TermQuery(_SK_TERM))
        .select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .join(docs.select("doc_id", F.col("n_chars").cast("long").alias("n_chars")), "doc_id")
    )
    return _sk(cand, better_desc="score_q", better_asc="n_chars").select(
        "doc_id", "score_q", "n_chars"
    )


# ----------------------------------------------------------------------
# score_percentiles — exact nearest-rank P50/P90/P99 of a term's
# quantized score distribution.
# ----------------------------------------------------------------------
_SP_TERM = "scan"
_SP_QS = (50, 90, 99)

_SP_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc2 AS (
  SELECT CAST(floor(score * 10000 + 0.5) AS BIGINT) AS v
  FROM ({_tsc(_SP_TERM)})
),
rk AS (
  SELECT v, CAST(row_number() OVER (ORDER BY v ASC) AS BIGINT) AS rnk FROM sc2
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sc2),
qv AS (SELECT CAST(unnest([{", ".join(str(q) for q in _SP_QS)}]) AS BIGINT) AS pct)
SELECT q.pct, t.n, r.v AS value
FROM qv q CROSS JOIN tot t
JOIN rk r ON r.rnk = CAST(ceil(q.pct * t.n / 100.0) AS BIGINT)
"""


@gate("score_percentiles", _SP_SQL)
def score_percentiles(spark, sf_dir):
    """Exact nearest-rank percentiles of score_q for 'scan'."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.collectors import score_percentiles as _sp
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    scored = s.scored(TermQuery(_SP_TERM)).select(
        F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q")
    )
    return _sp(scored, "score_q", qs=_SP_QS)
