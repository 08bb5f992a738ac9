"""Gate registry round-5 part x: crawl operations — team-draft
interleaving (online evaluation), politeness-constrained importance-
ordered fetch scheduling, and mirrored-host detection.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# team_draft_interleave — Radlinski CIKM'08 team draft between the BM25
# and ClassicSimilarity top-10 for one query, coin replaced by strict
# round alternation (ABBA).  The Spark side folds the 2k pick steps in
# one F.aggregate; the oracle replays them with a recursive CTE carrying
# (picked, docs, teams) list state — independent mechanisms, identical
# pick sequence.
# ----------------------------------------------------------------------
_TDI_TERM = "vector"
_TDI_K = 10


def _tdi_cte_chain() -> str:
    """Recursive-CTE replay of the deterministic team draft, up to the
    `fin` CTE holding (docs, teams) — shared with the credit gate in
    gate_round5y."""
    pre_rec = SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1)
    return (
        pre_rec
        + ","
        + _SQL_SCORED
        + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS ra
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_TDI_TERM)})
  ) QUALIFY ra <= {_TDI_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_TDI_TERM}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rb
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{_TDI_TERM}'
  ) QUALIFY rb <= {_TDI_K}
),
la AS (SELECT list(doc_id ORDER BY ra) AS l FROM ra),
lb AS (SELECT list(doc_id ORDER BY rb) AS l FROM rb),
td(i, picked, docs, teams) AS (
  SELECT 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), CAST([] AS VARCHAR[])
  UNION ALL
  SELECT s.i + 1,
         CASE WHEN s.pick IS NULL THEN s.picked ELSE list_append(s.picked, s.pick) END,
         CASE WHEN s.pick IS NULL THEN s.docs ELSE list_append(s.docs, s.pick) END,
         CASE WHEN s.pick IS NULL THEN s.teams ELSE list_append(s.teams, s.team) END
  FROM (
    SELECT q.i, q.picked, q.docs, q.teams, q.team,
           list_filter(CASE WHEN q.team = 'A' THEN q.la ELSE q.lb END,
                       x -> NOT list_contains(q.picked, x))[1] AS pick
    FROM (
      SELECT td.i, td.picked, td.docs, td.teams, la.l AS la, lb.l AS lb,
             CASE WHEN ((((td.i + 2) // 2) % 2) = 1) = (((td.i + 1) % 2) = 1)
                  THEN 'A' ELSE 'B' END AS team
      FROM td, la, lb
      WHERE td.i < {2 * _TDI_K}
    ) q
  ) s
),
fin AS (SELECT docs, teams FROM td ORDER BY i DESC LIMIT 1)
"""
    )


def _tdi_sql() -> str:
    return (
        _tdi_cte_chain()
        + """
SELECT CAST(generate_subscripts(docs, 1) AS BIGINT) AS pos,
       unnest(docs) AS doc_id,
       teams[generate_subscripts(docs, 1)] AS team
FROM fin
"""
    )


@gate("team_draft_interleave", _tdi_sql())
def team_draft_interleave(spark, sf_dir):
    """Deterministic team-draft interleaving of BM25 vs Classic top-10."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.interleave import team_draft_interleave as _tdi
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_TDI_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return scored.withColumn("rank", F.row_number().over(w))

    return _tdi(_ranked(searcher), _ranked(classic), k=_TDI_K)


# ----------------------------------------------------------------------
# crawl_schedule — Mercator politeness (one fetch per host per round,
# Heydon & Najork WWW'99) x importance-ordered crawling (Cho et al.
# WWW'98) with n_chars as the static priority.  Two windows, exact.
# ----------------------------------------------------------------------
_SCHED_K = 50

_SCHED_SQL = f"""
WITH rounds AS (
  SELECT source AS host, doc_id, CAST(n_chars AS BIGINT) AS prio,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS BIGINT)
           AS fetch_round
  FROM documents
)
SELECT schedule_pos, fetch_round, host, doc_id FROM (
  SELECT host, doc_id, fetch_round,
         CAST(row_number() OVER (
           ORDER BY fetch_round ASC, prio DESC, doc_id ASC) AS BIGINT)
           AS schedule_pos
  FROM rounds
) WHERE schedule_pos <= {_SCHED_K}
"""


@gate("crawl_schedule", _SCHED_SQL)
def crawl_schedule(spark, sf_dir):
    """Politeness-constrained importance-ordered fetch plan, first 50."""
    from lucenenet_spark.functions.crawl import crawl_schedule as _cs
    from lucenenet_spark.plans.gate import _docs_table

    return _cs(_docs_table(spark, sf_dir), k=_SCHED_K)


# ----------------------------------------------------------------------
# mirror_hosts — Bharat & Broder WWW'99: top host pairs by exact
# Jaccard of shingle (token 3-gram) profiles.  The oracle rebuilds the
# profiles with the same filter-then-slice gram construction the Spark
# side (and winnowing) uses.
# ----------------------------------------------------------------------
_MIRROR_TOP = 10

_MIRROR_SQL = f"""
WITH nodes AS (
  SELECT source AS host, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
prof AS (
  SELECT DISTINCT host, array_to_string(toks[u.j:u.j + 2], ' ') AS shingle
  FROM nodes, unnest(generate_series(1, greatest(length(toks) - 2, 0))) AS u(j)
),
sz AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM prof GROUP BY host),
iv AS (
  SELECT a.host AS host_a, b.host AS host_b, CAST(count(*) AS BIGINT) AS inter
  FROM prof a JOIN prof b ON a.shingle = b.shingle AND a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b, inter, x.n AS n_a, y.n AS n_b,
       CAST(floor(CAST(inter AS DOUBLE)
                  / CAST(x.n + y.n - inter AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS jaccard_q6
FROM iv JOIN sz x ON x.host = host_a JOIN sz y ON y.host = host_b
ORDER BY jaccard_q6 DESC, host_a ASC, host_b ASC LIMIT {_MIRROR_TOP}
"""


@gate("mirror_hosts", _MIRROR_SQL)
def mirror_hosts(spark, sf_dir):
    """Top-10 host pairs by shingle-profile Jaccard (mirror candidates)."""
    from lucenenet_spark.functions.crawl import mirror_hosts as _mh
    from lucenenet_spark.plans.gate import _docs_table

    return _mh(_docs_table(spark, sf_dir), top=_MIRROR_TOP)
