"""Gate registry round-5 part zzb: selective search end-to-end and the
local-IDF divergence audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# selective_search — Kulkarni & Callan TOIS'15: ReDDE-routed top-3 of
# the topical (source) shards, exact recall-at-probe audit.
# ----------------------------------------------------------------------
_SS_TERM = "vector"
_SS_PROBE = 3
_SS_K = 10
_SS_MOD = 5
_SS_TOP = 50

_SS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc0 AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
  FROM ({_tsc(_SS_TERM)})
),
smp AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS r
    FROM sc0 WHERE doc_id % {_SS_MOD} = 0
  ) WHERE r <= {_SS_TOP}
),
hits AS (
  SELECT d.source AS shard, CAST(count(*) AS BIGINT) AS sample_hits
  FROM smp JOIN documents d USING (doc_id)
  GROUP BY 1
),
chosen AS (
  SELECT shard FROM (
    SELECT shard,
           row_number() OVER (ORDER BY sample_hits * {_SS_MOD} DESC, shard ASC) AS r
    FROM hits) WHERE r <= {_SS_PROBE}
),
scd AS (
  SELECT s.doc_id, d.source AS shard, s.score_q
  FROM sc0 s JOIN documents d USING (doc_id)
),
page AS (
  SELECT rank, doc_id, shard, score_q FROM (
    SELECT s.*, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM scd s JOIN chosen USING (shard)
  ) WHERE rank <= {_SS_K}
),
gtop AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS g
    FROM scd) WHERE g <= {_SS_K}
),
ov AS (
  SELECT CAST(count(*) AS BIGINT) AS global_overlap
  FROM page JOIN gtop USING (doc_id)
)
SELECT CAST(p.rank AS BIGINT) AS rank, p.doc_id, p.shard, p.score_q,
       ov.global_overlap
FROM page p, ov
"""


@gate("selective_search", _SS_SQL)
def selective_search(spark, sf_dir):
    """ReDDE-routed top-10 over 3 of the topical source shards."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.sharded import selective_search_topk

    _, s, _ = get_engine(spark, sf_dir)
    return selective_search_topk(
        s, _docs_table(spark, sf_dir), _SS_TERM,
        shard_col="source", n_probe=_SS_PROBE, k=_SS_K,
        sample_mod=_SS_MOD, n_sample_top=_SS_TOP,
    )


# ----------------------------------------------------------------------
# local_idf_divergence — why brokers exchange global stats: max
# per-shard |idf_local - idf_global|, quantized before differencing.
# ----------------------------------------------------------------------
_ID_TERMS = ("vector", "merge", "query")
_ID_NS = 4

_ID_IN = ", ".join(f"'{t}'" for t in _ID_TERMS)

_ID_SQL = SQL_PRELUDE + f""",
ns AS (
  SELECT doc_id % {_ID_NS} AS shard, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_s
  FROM dl GROUP BY 1
),
dfs AS (
  SELECT term, doc_id % {_ID_NS} AS shard, CAST(count(*) AS BIGINT) AS df_s
  FROM post WHERE term IN ({_ID_IN}) GROUP BY 1, 2
),
loc AS (
  SELECT d.term, d.shard,
         CAST(floor(ln(1 + (CAST(n.n_s AS DOUBLE) - d.df_s + 0.5) / (d.df_s + 0.5))
                    * 1000000.0 + 0.5) AS BIGINT) AS idf_local_q6
  FROM dfs d JOIN ns n USING (shard)
),
gl AS (
  SELECT term, CAST(df AS BIGINT) AS df,
         CAST(floor(ln(1 + (cs.n - df + 0.5) / (df + 0.5)) * 1000000.0 + 0.5)
              AS BIGINT) AS idf_global_q6
  FROM ts, cs WHERE term IN ({_ID_IN})
)
SELECT l.term, g.df, g.idf_global_q6,
       CAST(max(abs(l.idf_local_q6 - g.idf_global_q6)) AS BIGINT) AS max_abs_dev_q6,
       CAST(count(*) AS BIGINT) AS n_shards_present
FROM loc l JOIN gl g USING (term)
GROUP BY l.term, g.df, g.idf_global_q6
"""


@gate("local_idf_divergence", _ID_SQL)
def local_idf_divergence(spark, sf_dir):
    """Per-term max |local - global| idf across the 4 hash shards."""
    from lucenenet_spark.search.sharded import local_idf_divergence as _id

    idx, _, _ = get_engine(spark, sf_dir)
    return _id(idx, _ID_TERMS, n_shards=_ID_NS)
