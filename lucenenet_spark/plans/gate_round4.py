"""Round-4 gates: SearchAfter deep pagination, Snowball stemming (de/fr),
SimpleQueryParser. Registered into gate.GATE_QUERIES like the other gate_*
modules; every entry carries a full DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _Q,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)
from lucenenet_spark.search.queries import TermQuery


# ==========================================================================
# SearchAfter deep pagination (Search/IndexSearcher.cs:297-511 +
# TopScoreDocCollector.cs:84-148 paging collector, tie-break :112-114):
# page 2 of term_query_topk — hits strictly after page 1's last (score,
# doc) in (score DESC, doc_id ASC) order, WITHOUT re-collecting page 1.
# ==========================================================================
@gate(
    "search_after",
    SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc1 AS ({_tsc('vector')}),
aft AS (
  SELECT score AS a_score, doc_id AS a_doc
  FROM (SELECT * FROM sc1 ORDER BY score DESC, doc_id ASC LIMIT 10)
  ORDER BY score ASC, doc_id DESC LIMIT 1
)
SELECT doc_id, {_Q} AS score_q
FROM sc1, aft
WHERE score < a_score OR (score = a_score AND doc_id > a_doc)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def search_after(spark, sf_dir):
    """Page 2 via IndexSearcher.search_after: the keyset predicate
    (score < after.score) OR (score = after.score AND doc_id > after.doc)
    composed into the same single-job top-k plan — deterministic because
    both engines compute the double score with the identical expression."""
    _, s, _ = get_engine(spark, sf_dir)
    q = TermQuery("vector")
    page1 = s.search(q, 10).collect()
    last = page1[-1]
    out = s.search_after((float(last["score"]), int(last["doc_id"])), q, 10)
    return _spark_score_q(out)
