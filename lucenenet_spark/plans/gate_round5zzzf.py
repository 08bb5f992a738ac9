"""Gate registry round-5 part zzzf: Condorcet (Copeland) rank fusion and
greedy submodular set-cover data selection.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# condorcet_fusion — Montague & Aslam CIKM'02 pairwise-majority fusion
# of the BM25 and Classic top-10 for one query, scored by the Copeland
# method (2*wins + ties, pure integers).  Same input pair as the Borda
# gate; absent docs rank below every present doc (rank = 2^40 fill).
# ----------------------------------------------------------------------
_CF_TERM = "vector"
_CF_K = 10
_CF_BIG = 1 << 40

_CF_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank_0
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_CF_TERM)})
  ) QUALIFY rank_0 <= {_CF_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_CF_TERM}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank_1
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{_CF_TERM}'
  ) QUALIFY rank_1 <= {_CF_K}
),
m AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         CAST(coalesce(ra.rank_0, {_CF_BIG}) AS BIGINT) AS r0,
         CAST(coalesce(rb.rank_1, {_CF_BIG}) AS BIGINT) AS r1
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
),
pv AS (
  SELECT a.doc_id AS da,
         (CASE WHEN a.r0 < b.r0 THEN 1 ELSE 0 END
          + CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END) AS na,
         (CASE WHEN b.r0 < a.r0 THEN 1 ELSE 0 END
          + CASE WHEN b.r1 < a.r1 THEN 1 ELSE 0 END) AS nb
  FROM m a JOIN m b ON a.doc_id <> b.doc_id
),
per AS (
  SELECT da AS doc_id,
         CAST(sum(CASE WHEN na > nb THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         CAST(sum(CASE WHEN na = nb THEN 1 ELSE 0 END) AS BIGINT) AS ties
  FROM pv GROUP BY da
)
SELECT doc_id, CAST(2 * wins + ties AS BIGINT) AS copeland_2x, wins, ties
FROM per
ORDER BY copeland_2x DESC, doc_id ASC LIMIT {_CF_K}
"""


@gate("condorcet_fusion", _CF_SQL)
def condorcet_fusion(spark, sf_dir):
    """Copeland-scored Condorcet fusion of BM25 + Classic top-10."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.hybrid import condorcet_fuse
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, s, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))

    def _rank(scored):
        return (
            scored.select(
                "doc_id",
                F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
                .cast("long")
                .alias("score_q"),
            )
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= _CF_K)
            .select("doc_id", "rank")
        )

    bm25 = _rank(s.scored(TermQuery(_CF_TERM)))
    classic_r = _rank(classic.scored(TermQuery(_CF_TERM)))
    return condorcet_fuse([bm25, classic_r], topk=_CF_K)


# ----------------------------------------------------------------------
# greedy_set_cover — Nemhauser/Wolsey/Fisher greedy max-coverage over
# per-document ADJACENT-BIGRAM sets (the unigram vocab of the synthetic
# corpus is 31 words, saturated by one doc; bigrams give a ~1k element
# space so all 6 rounds select): each round picks the doc covering the
# most still-uncovered bigrams.  Oracle unrolls the rounds as a CTE
# chain (the k-core pattern) over the same raw-token stream.
# ----------------------------------------------------------------------
_GSC_ROUNDS = 6


def _gsc_sql(rounds: int) -> str:
    parts = [
        """bg AS (
  SELECT a.doc_id, a.term || ' ' || b.term AS elem
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term <> '' AND b.term <> ''
)""",
        "sets AS (SELECT DISTINCT doc_id AS sid, elem FROM bg)",
        "cov0 AS (SELECT elem FROM sets WHERE 1 = 0)",
        "ch0 AS (SELECT sid FROM sets WHERE 1 = 0)",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""w{r} AS (
  SELECT sid, CAST(count(*) AS BIGINT) AS gain
  FROM sets s
  WHERE s.elem NOT IN (SELECT elem FROM cov{r - 1})
    AND s.sid NOT IN (SELECT sid FROM ch{r - 1})
  GROUP BY sid ORDER BY gain DESC, sid ASC LIMIT 1
)""")
        parts.append(
            f"cov{r} AS (SELECT elem FROM cov{r - 1} UNION "
            f"SELECT s.elem FROM sets s WHERE s.sid IN (SELECT sid FROM w{r}))"
        )
        parts.append(
            f"ch{r} AS (SELECT sid FROM ch{r - 1} UNION ALL SELECT sid FROM w{r})"
        )
        parts.append(
            f"row{r} AS (SELECT CAST({r} AS BIGINT) AS \"round\", w.sid AS doc_id, "
            f"w.gain, (SELECT CAST(count(*) AS BIGINT) FROM cov{r}) AS covered_total "
            f"FROM w{r} w)"
        )
    body = ",\n".join(parts)
    union = " UNION ALL ".join(f"SELECT * FROM row{r}" for r in range(1, rounds + 1))
    return SQL_PRELUDE + ",\n" + body + f"\nSELECT * FROM ({union}) ORDER BY \"round\" ASC"


@gate("greedy_set_cover", _gsc_sql(_GSC_ROUNDS))
def greedy_set_cover_gate(spark, sf_dir):
    """6-round greedy max-coverage selection over doc bigram sets."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.sampling import greedy_set_cover

    _, _, docs = get_engine(spark, sf_dir)
    # adjacent raw-token bigrams; an empty token breaks adjacency, same
    # as the oracle's pos/pos+1 join over the unfiltered split stream
    sets = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "filter("
                    " transform(slice(split(text, ' '), 1,"
                    "   greatest(size(split(text, ' ')) - 1, 0)),"
                    "  (x, i) -> IF(x <> '' AND split(text, ' ')[i + 1] <> '',"
                    "              concat(x, ' ', split(text, ' ')[i + 1]), NULL)),"
                    " s -> s IS NOT NULL)"
                )
            ).alias("elem"),
        )
    )
    return greedy_set_cover(
        sets, rounds=_GSC_ROUNDS, set_col="doc_id", elem_col="elem"
    ).orderBy(F.asc("round"))
