"""Gate registry round-5 part zzk: planning cost models — the
IndexOrDocValues execution choice and the df-ascending conjunction
order audit.  All-integer outputs straight off the term dictionary
(plus one postings pass for the true intersection sizes).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# index_or_docvalues_choice — three lead queries of different
# selectivity against the term range ['s', 't') (scan/sort/slow/...).
# ----------------------------------------------------------------------
_IOD_LEADS = ("vector", "scan", "customer")
_IOD_LO, _IOD_HI = "s", "t"
_IOD_RATIO = 8
_IOD_IN = ", ".join(f"'{t}'" for t in _IOD_LEADS)

_IOD_SQL = SQL_PRELUDE + f""",
rng AS (
  SELECT CAST(count(*) AS BIGINT) AS range_n_terms,
         CAST(coalesce(sum(df), 0) AS BIGINT) AS range_cost
  FROM ts WHERE term >= '{_IOD_LO}' AND term < '{_IOD_HI}'
),
leads AS (SELECT unnest([{_IOD_IN}]) AS lead_term),
ls AS (
  SELECT l.lead_term, CAST(coalesce(ts.df, 0) AS BIGINT) AS lead_df
  FROM leads l LEFT JOIN ts ON ts.term = l.lead_term
)
SELECT lead_term, lead_df, r.range_n_terms, r.range_cost,
       CAST(lead_df * {_IOD_RATIO} AS BIGINT) AS verify_cost,
       CASE WHEN lead_df * {_IOD_RATIO} < r.range_cost
            THEN 'docvalues' ELSE 'index' END AS chosen
FROM ls, rng r
"""


@gate("index_or_docvalues_choice", _IOD_SQL)
def index_or_docvalues_choice(spark, sf_dir):
    """IndexOrDocValuesQuery strategy pick per lead selectivity."""
    from lucenenet_spark.search.cost_model import index_or_docvalues_choice as _io

    idx, _, _ = get_engine(spark, sf_dir)
    return _io(idx, list(_IOD_LEADS), _IOD_LO, _IOD_HI, verify_ratio=_IOD_RATIO)


# ----------------------------------------------------------------------
# intersection_order_audit — true intersection cardinality after each
# df-ascending step of a 4-term conjunction.
# ----------------------------------------------------------------------
_IX_TERMS = ("scan", "join", "merge", "stream")
_IX_IN = ", ".join(f"'{t}'" for t in _IX_TERMS)

_IX_SQL = SQL_PRELUDE + f""",
sel AS (
  SELECT CAST(row_number() OVER (ORDER BY df ASC, term ASC) AS BIGINT) AS step,
         term, CAST(df AS BIGINT) AS df
  FROM ts WHERE term IN ({_IX_IN})
),
dt AS (
  SELECT DISTINCT p.doc_id, s.step
  FROM post p JOIN sel s USING (term)
),
flags AS (
  SELECT doc_id,
         max(CASE WHEN step = 1 THEN 1 ELSE 0 END) AS h1,
         max(CASE WHEN step = 2 THEN 1 ELSE 0 END) AS h2,
         max(CASE WHEN step = 3 THEN 1 ELSE 0 END) AS h3,
         max(CASE WHEN step = 4 THEN 1 ELSE 0 END) AS h4
  FROM dt GROUP BY doc_id
),
pl AS (
  SELECT doc_id, h1 * (1 + h2 * (1 + h3 * (1 + h4))) AS plen FROM flags
)
SELECT s.step, s.term, s.df,
       CAST((SELECT count(*) FROM pl WHERE pl.plen >= s.step) AS BIGINT)
         AS inter_size
FROM sel s
"""


@gate("intersection_order_audit", _IX_SQL)
def intersection_order_audit(spark, sf_dir):
    """df-ascending conjunction prefix cardinalities."""
    from lucenenet_spark.search.cost_model import intersection_order_audit as _ix

    idx, _, _ = get_engine(spark, sf_dir)
    return _ix(idx, list(_IX_TERMS))
