"""Gate registry round-5 part zzh: FeatureField bounded rank-feature
scoring (saturation + log transforms over a static doc feature) and the
RoaringDocIdSet array/bitmap/inverse layout audit.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

_FT_TERM = "filter"
_FT_PIVOT = 300.0
_FT_W = 2.0

# ----------------------------------------------------------------------
# feature_saturation_topk — BM25(filter) + 2.0 * sat(n_chars, 300).
# ----------------------------------------------------------------------
_FS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
base AS ({_tsc(_FT_TERM)})
SELECT doc_id,
       CAST(floor((score + {_FT_W!r} * (CAST(d.n_chars AS DOUBLE)
             / (CAST(d.n_chars AS DOUBLE) + {_FT_PIVOT!r}))) * 10000 + 0.5)
            AS BIGINT) AS score_q
FROM base JOIN documents d USING (doc_id)
ORDER BY score_q DESC, doc_id ASC LIMIT 15
"""


@gate("feature_saturation_topk", _FS_SQL)
def feature_saturation_topk(spark, sf_dir):
    """FeatureField.newSaturationQuery over n_chars, added to a
    TermQuery as a SHOULD clause; bounded boost, monotone in feature."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.features import feature_boosted, saturation
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    out = feature_boosted(
        s, TermQuery(_FT_TERM), docs.select("doc_id", "n_chars"), "n_chars",
        lambda v: saturation(v, _FT_PIVOT), weight=_FT_W,
    )
    return (
        out.select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(15)
    )


# ----------------------------------------------------------------------
# feature_log_topk — BM25(filter) + 0.3 * ln(1 + n_chars).
# ----------------------------------------------------------------------
_FL_W = 0.3

_FL_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
base AS ({_tsc(_FT_TERM)})
SELECT doc_id,
       CAST(floor((score + {_FL_W!r} * ln(1.0 + CAST(d.n_chars AS DOUBLE)))
             * 10000 + 0.5) AS BIGINT) AS score_q
FROM base JOIN documents d USING (doc_id)
ORDER BY score_q DESC, doc_id ASC LIMIT 15
"""


@gate("feature_log_topk", _FL_SQL)
def feature_log_topk(spark, sf_dir):
    """FeatureField LogFunction blend (w * ln(a + v), a=1)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.features import feature_boosted, log_feature
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    out = feature_boosted(
        s, TermQuery(_FT_TERM), docs.select("doc_id", "n_chars"), "n_chars",
        lambda v: log_feature(v, 1.0), weight=_FL_W,
    )
    return (
        out.select(
            "doc_id",
            F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("score_q"),
        )
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(15)
    )


# ----------------------------------------------------------------------
# roaring_docidset — encoding choice per 64-doc block for the docset of
# a mid-frequency term; exact integer byte accounting.
# ----------------------------------------------------------------------
_RD_TERM = "scan"
_RD_BITS = 6  # 64-doc blocks: array < 4, inverse > 60, bitmap between

_RD_SQL = SQL_PRELUDE + f""",
ds AS (SELECT DISTINCT doc_id FROM post WHERE term = '{_RD_TERM}'),
blk AS (
  SELECT CAST(doc_id // 64 AS BIGINT) AS block_id,
         CAST(count(*) AS BIGINT) AS card
  FROM ds GROUP BY 1
)
SELECT block_id, card,
       CASE WHEN card < 4 THEN 'array'
            WHEN card > 60 THEN 'inverse'
            ELSE 'bitmap' END AS encoding,
       CAST(CASE WHEN card < 4 THEN 2 * card
                 WHEN card > 60 THEN 2 * (64 - card)
                 ELSE 8 END AS BIGINT) AS n_bytes
FROM blk
"""


@gate("roaring_docidset", _RD_SQL)
def roaring_docidset(spark, sf_dir):
    """RoaringDocIdSet layout audit for docset(scan) at 64-doc blocks."""
    from lucenenet_spark.index.layout_stats import roaring_docidset_audit
    from lucenenet_spark.search.queries import TermQuery

    _, s, _ = get_engine(spark, sf_dir)
    return roaring_docidset_audit(s.docset(TermQuery(_RD_TERM)), block_bits=_RD_BITS)
