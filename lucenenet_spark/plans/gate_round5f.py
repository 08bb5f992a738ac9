"""Gate registry part 5f: Benchmark Quality package (TrecJudge +
QualityStats) and Classification.Utils DatasetSplitter."""

from __future__ import annotations

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _Q,
    _SQL_SCORED,
    _tsc,
    gate,
    get_engine,
)

# ==========================================================================
# QualityBenchmark / QualityStats / TrecJudge
# (src/Lucene.Net.Benchmark/Quality/QualityStats.cs:86-141,
#  Quality/Trec/TrecJudge.cs, Quality/QualityBenchmark.cs:66-100)
# ==========================================================================
_QUALITY_TERMS = ("vector", "merge", "key")
_LCM20 = 232792560

_TREC_QUALITY_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f"""
, qres AS (
  SELECT 'vector' AS query, doc_id, {_Q} AS score_q FROM ({_tsc('vector')})
  UNION ALL
  SELECT 'merge' AS query, doc_id, {_Q} AS score_q FROM ({_tsc('merge')})
  UNION ALL
  SELECT 'key' AS query, doc_id, {_Q} AS score_q FROM ({_tsc('key')})
),
topk AS (
  SELECT * FROM (
    SELECT query, doc_id,
           row_number() OVER (PARTITION BY query
                              ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM qres
  ) WHERE rank <= 20
),
judg AS (
  SELECT term AS query, doc_id FROM post
  WHERE term IN ('vector', 'merge', 'key') AND tf >= 2
),
maxg AS (
  SELECT query, CAST(count(*) AS BIGINT) AS max_good FROM judg GROUP BY query
),
rc AS (
  SELECT t.query, t.rank,
         CASE WHEN j.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel,
         sum(CASE WHEN j.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY t.query ORDER BY t.rank) AS cum_good
  FROM topk t
  LEFT JOIN judg j ON t.query = j.query AND t.doc_id = j.doc_id
),
agg AS (
  SELECT query,
         CAST(max(rank) AS BIGINT) AS num_points,
         CAST(sum(rel) AS BIGINT) AS num_good,
         CAST(sum(CASE WHEN rank <= 5 THEN rel ELSE 0 END) AS BIGINT) AS good5,
         CAST(sum(CASE WHEN rank <= 10 THEN rel ELSE 0 END) AS BIGINT) AS good10,
         min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         CAST(coalesce(sum(CASE WHEN rel = 1
                                THEN cum_good * ({_LCM20} // rank) END), 0)
              AS BIGINT) AS avp_num
  FROM rc GROUP BY query
)
SELECT a.query, a.num_points, a.num_good,
       CAST(coalesce(m.max_good, 0) AS BIGINT) AS max_good,
       CAST(floor(a.good5 / 5.0 * 10000 + 0.5) AS BIGINT) AS p5_q,
       CAST(floor(a.good10 / 10.0 * 10000 + 0.5) AS BIGINT) AS p10_q,
       CAST(floor(CASE WHEN a.first_rel IS NOT NULL AND a.first_rel <= 5
                       THEN 1.0 / a.first_rel ELSE 0.0 END
                  * 10000 + 0.5) AS BIGINT) AS mrr_q,
       CAST(floor(CASE WHEN coalesce(m.max_good, 0) > 0
                       THEN a.avp_num / ({_LCM20}.0 * m.max_good)
                       ELSE 0.0 END * 10000 + 0.5) AS BIGINT) AS avp_q,
       CAST(floor(CASE WHEN coalesce(m.max_good, 0) > 0
                       THEN CAST(a.num_good AS DOUBLE) / m.max_good
                       ELSE CAST(a.num_good AS DOUBLE) / a.num_points END
                  * 10000 + 0.5) AS BIGINT) AS recall_q
FROM agg a LEFT JOIN maxg m USING (query)
"""


@gate("trec_quality", _TREC_QUALITY_SQL)
def trec_quality(spark, sf_dir):
    """QualityBenchmark over 3 single-term QualityQueries with
    corpus-derived TrecJudge qrels (relevant iff tf >= 2): per query,
    P@5 / P@10 / MRR(<=5) / AvP / recall exactly as QualityStats
    accumulates them (quantized; AvP via exact LCM(1..20) numerator)."""
    from lucenenet_spark.search.quality import quality_benchmark

    _, s, _ = get_engine(spark, sf_dir)
    return quality_benchmark(s, _QUALITY_TERMS, k=20, min_tf=2)


# ==========================================================================
# DatasetSplitter (src/Lucene.Net.Classification/Utils/DatasetSplitter.cs:
# 100-165): even ordinals -> test until size*testRatio, then c.v. until
# size*cvRatio, rest train — closed form over the dense doc ordinal.
# ==========================================================================
_DATASET_SPLIT_SQL = """
WITH cs AS (SELECT CAST(count(*) AS DOUBLE) AS size FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 AND (doc_id // 2) < size * 0.2 THEN 'test'
            WHEN doc_id - least((doc_id + 1) // 2,
                                CAST(ceil(size * 0.2) AS BIGINT))
                 < size * 0.1 THEN 'cv'
            ELSE 'train' END AS split
FROM documents, cs
"""


@gate("dataset_split", _DATASET_SPLIT_SQL)
def dataset_split_gate(spark, sf_dir):
    """DatasetSplitter(testRatio=0.2, crossValidationRatio=0.1) over the
    corpus in index order; every doc labeled test/cv/train."""
    import os

    from lucenenet_spark.functions.datasets import dataset_split

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return dataset_split(docs, 0.2, 0.1).select("doc_id", "split")


# ==========================================================================
# EarlyTerminatingSortingCollector over a sorted index layout
# (src/Lucene.Net.Misc/Index/Sorter/EarlyTerminatingSortingCollector.cs +
#  SortingMergePolicy.cs: segments pre-sorted by the sort key let the
#  collector throw CollectionTerminatedException after numDocsToCollect
#  per segment; here the layout is globally range-sorted so limit(k)'s
#  incremental CollectLimit reads only the leading partitions).
# ==========================================================================
_EARLY_TERM_SQL = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars ASC, doc_id ASC LIMIT 12
"""


@gate("early_terminating_sorted", _EARLY_TERM_SQL)
def early_terminating_sorted(spark, sf_dir):
    """Top-12 by n_chars via the sorted-layout early-termination path:
    range-repartition + in-partition sort = SortingMergePolicy's sorted
    segments; early_terminating_topk is a bare limit(k), never a global
    sort at query time."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.search.collectors import early_terminating_topk

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sorted_layout = docs.repartitionByRange(
        8, F.col("n_chars"), F.col("doc_id")
    ).sortWithinPartitions("n_chars", "doc_id")
    return early_terminating_topk(sorted_layout, 12).select("doc_id", "n_chars")
