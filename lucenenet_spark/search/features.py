"""FeatureField rank features: static per-doc signals folded into the
text score.

The successor engine's FeatureField stores a static document feature
(pagerank, url depth, recency) in the index and exposes three monotone
scoring transforms added to the text query as a SHOULD clause:

- SaturationFunction  w * v / (v + pivot)
- LogFunction         w * ln(a + v)
- SigmoidFunction     w * v^a / (v^a + pivot^a)

All three are bounded (so the feature can never drown the text score
the way a raw multiplicative boost can) and monotone in v.  The
reference repo's closest seam is the function-query family
(/root/reference/src/Lucene.Net.Queries/Function/); the three bounded
shapes are the refinement the successor engine added for
learning-to-rank-lite serving.

Spark-first: the feature is any numeric column of a per-doc frame; the
transform is a Column expression; the blend is a left join on doc_id +
an addition — whole-stage codegen end to end, the join broadcastable
when the feature table is a small static rank file and co-partitioned
when it is corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Query
from lucenenet_spark.search.searcher import IndexSearcher


def saturation(v: Column, pivot: float) -> Column:
    """v / (v + pivot) — half-scores at v == pivot, asymptote 1."""
    if pivot <= 0:
        raise ValueError("pivot must be positive")
    vd = v.cast("double")
    return vd / (vd + F.lit(float(pivot)))


def log_feature(v: Column, a: float = 1.0) -> Column:
    """ln(a + v), a >= 1 so the transform is nonnegative at v=0."""
    if a < 1.0:
        raise ValueError("a must be >= 1")
    return F.log(F.lit(float(a)) + v.cast("double"))


def sigmoid(v: Column, pivot: float, a: float) -> Column:
    """v^a / (v^a + pivot^a) — saturation with tunable steepness a."""
    if pivot <= 0 or a <= 0:
        raise ValueError("pivot and a must be positive")
    va = F.pow(v.cast("double"), F.lit(float(a)))
    return va / (va + F.lit(float(pivot) ** float(a)))


def feature_boosted(
    searcher: IndexSearcher,
    query: Query,
    features: DataFrame,
    feature_col: str,
    transform,
    weight: float = 1.0,
) -> DataFrame:
    """Text score + w * transform(feature) -> (doc_id, score).

    ``features`` is a (doc_id, <feature_col>) frame; docs missing from
    it contribute feature 0 (FeatureField treats an absent feature as
    no boost).  ``transform`` is one of the functions above, applied to
    the feature Column.
    """
    base = searcher.scored(query)
    feat = features.select(
        "doc_id", F.coalesce(F.col(feature_col).cast("double"), F.lit(0.0)).alias("_v")
    )
    joined = base.join(feat, "doc_id", "left").fillna({"_v": 0.0})
    boost = F.lit(float(weight)) * transform(F.col("_v"))
    return joined.select("doc_id", (F.col("score") + boost).alias("score"))
