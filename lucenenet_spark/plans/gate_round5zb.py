"""Gate registry round-5 part zb: count-min frequency sketch and
learning-to-rank feature export.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# cms_term_counts — Cormode-Muthukrishnan count-min sketch (d=4, w=256)
# over the raw token stream, probed for 8 fixed terms with the true
# count beside the (over)estimate.  All-integer; oracle rebuilds the
# sketch with the same md5 row hashes.
# ----------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 256
_CMS_PROBES = (
    "vector", "merge", "query", "data", "scan", "filter", "row", "zz_absent"
)


def _cms_hash_sql(col: str, j: int) -> str:
    return (
        "("
        + " + ".join(
            f"((strpos('0123456789abcdef', substr(md5('{j}#' || {col}), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)})"
            for i in range(8)
        )
        + f") % {_CMS_W}"
    )


def _cms_sql() -> str:
    row_units = "\nUNION ALL\n".join(
        f"SELECT {j} AS row, {_cms_hash_sql('w', j)} AS bucket FROM tokn"
        for j in range(_CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        "SELECT '{v}' AS value, {j} AS row, {h} AS bucket".format(
            v=v, j=j, h=_cms_hash_sql(f"'{v}'", j)
        )
        for v in _CMS_PROBES
        for j in range(_CMS_D)
    )
    return f"""
WITH tokn AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
cells AS ({row_units}),
sk AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY row, bucket
),
probes AS ({probe_rows}),
est AS (
  SELECT p.value, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est
  FROM probes p LEFT JOIN sk USING (row, bucket)
  GROUP BY p.value
),
tru AS (
  SELECT w AS value, CAST(count(*) AS BIGINT) AS exact FROM tokn GROUP BY w
)
SELECT e.value, e.est, CAST(coalesce(t.exact, 0) AS BIGINT) AS exact
FROM est e LEFT JOIN tru t USING (value)
ORDER BY e.value ASC
"""


@gate("cms_term_counts", _cms_sql())
def cms_term_counts(spark, sf_dir):
    """CMS point estimates beside true counts for 8 probe terms."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.sketches import cms_estimate, cms_sketch
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    tokn = docs.select(F.explode(toks).alias("w"))
    sk = cms_sketch(tokn, "w", depth=_CMS_D, width=_CMS_W)
    probes = docs.sparkSession.createDataFrame(
        [(v,) for v in _CMS_PROBES], "term string"
    )
    est = cms_estimate(sk, probes, col="term", depth=_CMS_D, width=_CMS_W)
    exact = tokn.groupBy(F.col("w").alias("value")).agg(
        F.count("*").cast("long").alias("exact")
    )
    return (
        est.join(exact, "value", "left")
        .select(
            "value", "est", F.coalesce("exact", F.lit(0)).cast("long").alias("exact")
        )
        .orderBy(F.asc("value"))
    )


# ----------------------------------------------------------------------
# ltr_features — LETOR-style feature export for the top-20 candidates
# of one term query (Liu F&T IR 2009): the engine's BM25 partial plus
# tf/dl/df/idf/density and a static doc feature, one plan, no UDFs.
# ----------------------------------------------------------------------
_LTR_TERM = "vector"
_LTR_K = 20

_LTR_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
page AS (
  SELECT doc_id, score_q AS bm25_q4,
         CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_LTR_TERM)})
  ) QUALIFY rank <= {_LTR_K}
),
tsx AS (SELECT df FROM ts WHERE term = '{_LTR_TERM}')
SELECT g.rank, g.doc_id, g.bm25_q4,
       CAST(p.tf AS BIGINT) AS tf,
       CAST(dl.dl AS BIGINT) AS dl,
       CAST(tsx.df AS BIGINT) AS df,
       CAST(floor(ln(1 + (cs.n - tsx.df + 0.5) / (tsx.df + 0.5)) * 1000000.0 + 0.5)
            AS BIGINT) AS idf_q6,
       CAST(floor(CAST(p.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS tf_norm_q6,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM page g
JOIN post p ON p.doc_id = g.doc_id AND p.term = '{_LTR_TERM}'
JOIN dl ON dl.doc_id = g.doc_id
JOIN documents d ON d.doc_id = g.doc_id
CROSS JOIN tsx CROSS JOIN cs
"""


@gate("ltr_features", _LTR_SQL)
def ltr_features(spark, sf_dir):
    """Top-20 LTR feature vectors for one term query."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.ltr import ltr_features as _ltr

    _, s, _ = get_engine(spark, sf_dir)
    return _ltr(s, _docs_table(spark, sf_dir), _LTR_TERM, k=_LTR_K)
