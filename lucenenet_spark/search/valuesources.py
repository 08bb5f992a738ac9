"""Function-query value sources as Spark Columns.

Re-expresses the ``Lucene.Net.Queries/Function`` seam — a ValueSource is
a per-document double derived from stored columns, and ``BoostedQuery``
multiplies a relevance score by it:

- ``ReciprocalFloatFunction`` (reference
  ``Lucene.Net.Queries/Function/ValueSources/ReciprocalFloatFunction.cs``):
  ``a / (m*x + b)`` — the classic recency boost shape.
- ``LinearFloatFunction`` (``LinearFloatFunction.cs``): ``m*x + c``.
- ``ScaleFloatFunction`` (``ScaleFloatFunction.cs``): min/max over the
  whole corpus, then ``(x - min) * (tmax - tmin)/(max - min) + tmin``.
  The reference walks every reader's values once to find min/max
  (``ScaleFloatFunction.CreateScaleInfo``); here that is a 2-row Spark
  aggregate cross-joined back (broadcast by AQE — one tiny row), so the
  scan parallelizes instead of running on one thread.
- ``BoostedQuery`` (``Lucene.Net.Queries/Function/BoostedQuery.cs``):
  ``score(q, d) * value(d)`` — a join of the scored docset against the
  stored-fields table on doc_id, then one multiply, all in whole-stage
  codegen.

The reference computes in float32; this engine's gate mode computes in
float64 end-to-end (both the BM25 factor and the value source), matching
the repo-wide double-oracle convention (plans/gate.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["recip", "linear", "scale_min_max", "boosted_scores"]


def recip(x: Column, m: float = 1.0, a: float = 1.0, b: float = 1.0) -> Column:
    """ReciprocalFloatFunction: a / (m*x + b)."""
    return F.lit(float(a)) / (F.lit(float(m)) * x + F.lit(float(b)))


def linear(x: Column, slope: float, intercept: float) -> Column:
    """LinearFloatFunction: slope*x + intercept."""
    return F.lit(float(slope)) * x + F.lit(float(intercept))


def scale_min_max(
    df: DataFrame, col: str, tmin: float = 0.0, tmax: float = 1.0
) -> DataFrame:
    """ScaleFloatFunction: adds ``scaled`` = (x-min)*(tmax-tmin)/(max-min)+tmin.

    min/max are corpus-wide (one tiny aggregate, cross-joined back — AQE
    broadcasts the single row). Degenerate max==min maps to tmin, the
    reference's scale=0 branch.
    """
    mm = df.agg(
        F.min(F.col(col)).cast("double").alias("_vs_mn"),
        F.max(F.col(col)).cast("double").alias("_vs_mx"),
    )
    x = F.col(col).cast("double")
    factor = F.when(
        F.col("_vs_mx") != F.col("_vs_mn"),
        (F.lit(float(tmax)) - F.lit(float(tmin))) / (F.col("_vs_mx") - F.col("_vs_mn")),
    ).otherwise(F.lit(0.0))
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("scaled", (x - F.col("_vs_mn")) * factor + F.lit(float(tmin)))
        .drop("_vs_mn", "_vs_mx")
    )


def boosted_scores(scored: DataFrame, values: DataFrame, value_col: str) -> DataFrame:
    """BoostedQuery: (doc_id, score) -> (doc_id, score * value).

    ``scored`` is any searcher docset with a ``score`` column; ``values``
    carries one double per doc_id (e.g. the output of
    :func:`scale_min_max` piped through :func:`recip`).
    """
    return scored.join(values.select("doc_id", value_col), "doc_id").select(
        "doc_id", (F.col("score") * F.col(value_col)).alias("score")
    )
