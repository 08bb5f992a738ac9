"""Search-quality evaluation — the Benchmark Quality package as DataFrame
aggregation.

Reference semantics:

- ``src/Lucene.Net.Benchmark/Quality/QualityStats.cs:86-115`` (AddResult):
  per ranked hit, cumulative precision ``p = goodSoFar / rank``; the MRR is
  ``1/rank`` of the FIRST relevant hit but only when that rank is <= 5;
  ``pReleventSum`` accumulates ``p`` at each relevant rank; recall is
  ``goodSoFar / maxGoodPoints``.
- ``QualityStats.cs:122-141`` (GetPrecisionAt / GetAvp): precision at a
  point beyond the result list degrades as ``numPoints*pAt[numPoints]/n``
  — algebraically ``numGood/n``, so the unified form used here is
  ``P@n = |relevant in top min(n, numPoints)| / n``;
  ``AvP = pReleventSum / maxGoodPoints`` (0 when no judgments).
- ``Quality/Trec/TrecJudge.cs``: judgments are a (query -> relevant doc
  set) map loaded from qrels; :func:`trec_judgments` derives a
  deterministic analogue from the corpus itself (tf >= min_tf).
- ``Quality/QualityBenchmark.cs:66-100`` (Execute): one top-k search per
  QualityQuery, one QualityStats per query.

Determinism contract (shared with the driver gates): ranks are computed on
the QUANTIZED score ``floor(score*10000+0.5)`` so the ordering is
bit-identical across engines, and every ratio metric is a SINGLE division
of exact integers — AvP's sum of fractions ``cumGood/rank`` is carried as
an exact BIGINT numerator over the common denominator LCM(1..20) =
232792560, so no cross-engine float-summation-order issue exists.

Scale notes: one window partition per quality query (a real qrels run has
hundreds of queries -> hundreds of partitions, parallel); judgments join is
a broadcast-size dimension at qrels scale; the per-query top-k reuses the
searcher's single-job plans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import TermQuery

#: QualityStats.MAX_POINTS (QualityStats.cs:34)
MAX_POINTS = 20

#: lcm(1..20) — exact common denominator for the AvP fraction sum.
_LCM20 = 232792560


def trec_judgments(index, terms, min_tf: int = 2) -> DataFrame:
    """TrecJudge analogue with corpus-derived qrels: doc is judged relevant
    for query term t iff tf(t, doc) >= min_tf (deterministic, independent
    of the ranking under test). Returns (query, doc_id)."""
    p = index.postings.filter(F.col("field") == index.default_field)
    return p.filter(
        F.col("term").isin(list(terms)) & (F.col("tf") >= int(min_tf))
    ).select(F.col("term").alias("query"), "doc_id")


def quality_benchmark(
    searcher,
    terms,
    k: int = MAX_POINTS,
    min_tf: int = 2,
) -> DataFrame:
    """QualityBenchmark.Execute over single-term QualityQueries: top-k BM25
    per query, one QualityStats row per query.

    Output columns (ratios quantized to ``floor(x*10000+0.5)`` bigints):
    (query, num_points, num_good, max_good, p5_q, p10_q, mrr_q, avp_q,
    recall_q).
    """
    if k > MAX_POINTS:
        raise ValueError(f"k={k} exceeds MAX_POINTS={MAX_POINTS}")
    terms = list(terms)

    parts = [
        searcher.scored(TermQuery(t)).select(
            F.lit(t).alias("query"),
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        for t in terms
    ]
    scored = reduce(DataFrame.unionByName, parts)

    w_rank = Window.partitionBy("query").orderBy(
        F.desc("score_q"), F.asc("doc_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= k
    )

    judg = trec_judgments(searcher.index, terms, min_tf)
    max_good = judg.groupBy("query").agg(
        F.count(F.lit(1)).cast("long").alias("max_good")
    )

    j = (
        ranked.join(
            judg.withColumn("rel", F.lit(1)), ["query", "doc_id"], "left"
        )
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn(
            "cum_good",
            F.sum("rel").over(Window.partitionBy("query").orderBy("rank")),
        )
    )

    agg = j.groupBy("query").agg(
        F.max("rank").cast("long").alias("num_points"),
        F.sum("rel").cast("long").alias("num_good"),
        F.sum(F.when(F.col("rank") <= 5, F.col("rel")).otherwise(0))
        .cast("long")
        .alias("good5"),
        F.sum(F.when(F.col("rank") <= 10, F.col("rel")).otherwise(0))
        .cast("long")
        .alias("good10"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        # exact integer numerator of pReleventSum over denominator LCM20:
        # sum over relevant ranks of cumGood * (LCM20 / rank)
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.col("cum_good") * F.expr(f"{_LCM20} div rank"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("avp_num"),
    )

    out = agg.join(max_good, "query", "left").withColumn(
        "max_good", F.coalesce(F.col("max_good"), F.lit(0).cast("long"))
    )

    def _q(col):
        return F.floor(col * F.lit(10000.0) + F.lit(0.5)).cast("long")

    mrr = F.when(
        F.col("first_rel").isNotNull() & (F.col("first_rel") <= 5),
        F.lit(1.0) / F.col("first_rel"),
    ).otherwise(F.lit(0.0))
    avp = F.when(
        F.col("max_good") > 0,
        F.col("avp_num") / (F.lit(float(_LCM20)) * F.col("max_good")),
    ).otherwise(F.lit(0.0))
    # QualityStats.cs:113: recall falls back to the running precision p
    # (= numGood/numPoints at the last point) when maxGoodPoints <= 0.
    recall = F.when(
        F.col("max_good") > 0, F.col("num_good") / F.col("max_good")
    ).otherwise(F.col("num_good") / F.col("num_points"))

    return out.select(
        "query",
        "num_points",
        "num_good",
        "max_good",
        _q(F.col("good5") / F.lit(5.0)).alias("p5_q"),
        _q(F.col("good10") / F.lit(10.0)).alias("p10_q"),
        _q(mrr).alias("mrr_q"),
        _q(avp).alias("avp_q"),
        _q(recall).alias("recall_q"),
    )
