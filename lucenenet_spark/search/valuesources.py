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

__all__ = [
    "recip",
    "linear",
    "scale_min_max",
    "boosted_scores",
    "const",
    "div_vs",
    "pow_vs",
    "sum_vs",
    "product_vs",
    "max_vs",
    "min_vs",
    "range_map",
    "if_vs",
    "term_freq_source",
    "tf_source",
    "doc_freq",
    "total_term_freq",
    "max_doc",
    "num_docs",
    "sum_total_term_freq",
    "query_value_source",
    "function_query",
    "custom_scores",
    "ord_field_source",
    "join_doc_freq",
    "norm_source",
    "classic_idf",
]


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


# --------------------------------------------------------------------------
# composable Column functions — the arithmetic / conditional half of the
# ValueSource DSL. Each is one whole-stage-codegen expression; composition
# nests Columns exactly as the reference nests ValueSources.
# --------------------------------------------------------------------------


def const(v: float) -> Column:
    """ConstValueSource / DoubleConstValueSource: a per-doc constant."""
    return F.lit(float(v))


def div_vs(a: Column, b: Column) -> Column:
    """DivFloatFunction: a / b (DualFloatFunction with Func=divide)."""
    return a / b


def pow_vs(a: Column, b: Column) -> Column:
    """PowFloatFunction: a ** b."""
    return F.pow(a, b)


def sum_vs(*xs: Column) -> Column:
    """SumFloatFunction (MultiFloatFunction with +)."""
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


def product_vs(*xs: Column) -> Column:
    """ProductFloatFunction (MultiFloatFunction with *)."""
    out = xs[0]
    for x in xs[1:]:
        out = out * x
    return out


def max_vs(*xs: Column) -> Column:
    """MaxFloatFunction: per-doc max over the sources."""
    return F.greatest(*xs) if len(xs) > 1 else xs[0]


def min_vs(*xs: Column) -> Column:
    """MinFloatFunction: per-doc min over the sources."""
    return F.least(*xs) if len(xs) > 1 else xs[0]


def range_map(
    x: Column, mn: float, mx: float, target: float, default: float | None = None
) -> Column:
    """RangeMapFloatFunction: ``mn <= x <= mx -> target``, else ``default``
    (or x itself when default is None, the reference's null-default path)."""
    inside = (x >= F.lit(float(mn))) & (x <= F.lit(float(mx)))
    other = F.lit(float(default)) if default is not None else x
    return F.when(inside, F.lit(float(target))).otherwise(other)


def if_vs(cond: Column, then: Column, otherwise: Column) -> Column:
    """IfFunction: boolean source selects between two value sources."""
    return F.when(cond, then).otherwise(otherwise)


# --------------------------------------------------------------------------
# index-stat sources — per-doc term frequency plus the per-reader scalar
# constants. The reference resolves the scalars once per reader
# (DocFreqValueSource.cs GetValues -> searcher.DocFreq); here they are one
# bounded driver lookup against the term-stats / index metadata, never a
# postings scan.
# --------------------------------------------------------------------------


def _stats_for(index, term: str, field: str | None):
    fld = field or index.default_field
    stats = index.term_stats
    if "field" in stats.columns:
        stats = stats.filter(F.col("field") == fld)
    rows = stats.filter(F.col("term") == term).select("df", "ttf").collect()
    return (int(rows[0]["df"]), int(rows[0]["ttf"])) if rows else (0, 0)


def term_freq_source(index, term: str, field: str | None = None) -> DataFrame:
    """TermFreqValueSource: (doc_id, tf) for docs containing the term —
    raw termFreq(), no similarity shaping."""
    fld = field or index.default_field
    post = index.postings
    if "field" in post.columns:
        post = post.filter(F.col("field") == fld)
    return post.filter(F.col("term") == term).select(
        "doc_id", F.col("tf").cast("double").alias("tf")
    )


def tf_source(index, term: str, field: str | None = None) -> DataFrame:
    """TFValueSource: Similarity.Tf(termFreq) — the classic ``sqrt(tf)``
    (TFValueSource.cs delegates to TFIDFSimilarity.Tf)."""
    return term_freq_source(index, term, field).select(
        "doc_id", F.sqrt(F.col("tf")).alias("tf")
    )


def doc_freq(index, term: str, field: str | None = None) -> float:
    """DocFreqValueSource's per-reader constant."""
    return float(_stats_for(index, term, field)[0])


def total_term_freq(index, term: str, field: str | None = None) -> float:
    """TotalTermFreqValueSource's per-reader constant."""
    return float(_stats_for(index, term, field)[1])


def max_doc(index) -> float:
    """MaxDocValueSource: reader.MaxDoc."""
    return float(index.max_doc)


def num_docs(index) -> float:
    """NumDocsValueSource: MaxDoc minus deletions (live-doc count)."""
    live = getattr(index, "live_docs", None)
    if live is not None:
        return float(live.count())
    return float(index.max_doc)


def sum_total_term_freq(index, field: str | None = None) -> float:
    """SumTotalTermFreqValueSource's per-reader constant."""
    return float(index._sttf(field or index.default_field))


def query_value_source(
    all_docs: DataFrame, scored: DataFrame, default: float = 0.0
) -> DataFrame:
    """QueryValueSource: per-doc score of a subquery, ``defVal`` for docs
    the query does not match (QueryValueSource.cs QueryDocValues) — a left
    join of the full docset against the scored docset, coalesced."""
    return all_docs.select("doc_id").join(
        scored.select("doc_id", "score"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("score"), F.lit(float(default))).alias("value"),
    )


def function_query(docs: DataFrame, value: Column) -> DataFrame:
    """FunctionQuery: matches EVERY document; score IS the value source
    (FunctionQuery.cs AllScorer — iterates all live docs)."""
    return docs.select("doc_id", value.cast("double").alias("score"))


def boosted_scores(scored: DataFrame, values: DataFrame, value_col: str) -> DataFrame:
    """BoostedQuery: (doc_id, score) -> (doc_id, score * value).

    ``scored`` is any searcher docset with a ``score`` column; ``values``
    carries one double per doc_id (e.g. the output of
    :func:`scale_min_max` piped through :func:`recip`).
    """
    return scored.join(values.select("doc_id", value_col), "doc_id").select(
        "doc_id", (F.col("score") * F.col(value_col)).alias("score")
    )


def custom_scores(
    scored: DataFrame, values: DataFrame, value_cols: list[str]
) -> DataFrame:
    """CustomScoreQuery with the default CustomScoreProvider
    (CustomScoreProvider.cs:63-87): ``ModifiedScore = subQueryScore *
    valSrcScores[0] * valSrcScores[1] * ...`` — one join of the scored
    docset against the per-doc value frame, then a chained multiply in
    whole-stage codegen. Zero value sources leaves the subquery score
    unchanged (the reference's empty-array branch)."""
    if not value_cols:
        return scored.select("doc_id", "score")
    out = scored.join(values.select("doc_id", *value_cols), "doc_id")
    score = F.col("score")
    for c in value_cols:
        score = score * F.col(c)
    return out.select("doc_id", score.alias("score"))


def norm_source(index, field: str | None = None, mode: str = "double") -> DataFrame:
    """NormValueSource (NormValueSource.cs): per-doc decoded field norm,
    ``Similarity.DecodeNormValue(norms.Get(doc))`` — for the classic
    TFIDF similarity the length norm ``1/sqrt(dl)``.

    mode='double' returns the exact ``1/sqrt(dl)`` the engine's double
    scoring mode uses (dl is stored per (doc, field) in ``doclens`` — a
    pure column expression, no join); mode='parity' decodes the stored
    SmallFloat315 ``norm_byte`` instead, reproducing the reference's
    byte-quantized value exactly. Docs with dl=0 get value 0 (the
    reference encodes +inf for an empty field; a 0 default is the
    useful neutral for function queries and is documented here as the
    deviation)."""
    if mode not in ("double", "parity"):
        raise ValueError("mode must be 'double' or 'parity'")
    fld = field or index.default_field
    dls = index.doclens.filter(F.col("field") == fld)
    if mode == "parity":
        # 256-entry SmallFloat315 decode table (SByte315ToSingle — the
        # reference's TFIDFSimilarity.DecodeNormValue) as an array
        # literal, element_at lookup like the searcher's norm cache.
        import numpy as np

        from lucenenet_spark.index.smallfloat import byte315_to_float

        tbl = F.array(
            *[F.lit(float(v)) for v in byte315_to_float(np.arange(256, dtype=np.uint8))]
        )
        return dls.select(
            "doc_id",
            F.element_at(tbl, F.col("norm_byte") + F.lit(1)).cast("double").alias("value"),
        )
    return dls.select(
        "doc_id",
        F.when(
            F.col("dl") > 0, F.lit(1.0) / F.sqrt(F.col("dl").cast("double"))
        ).otherwise(F.lit(0.0)).alias("value"),
    )


def classic_idf(df: float, max_doc: float) -> float:
    """IDFValueSource's per-reader scalar (IDFValueSource.cs delegates to
    TFIDFSimilarity.Idf): ``ln(maxDoc / (df + 1)) + 1``."""
    import math

    return math.log(max_doc / (df + 1.0)) + 1.0


def join_doc_freq(
    docs: DataFrame,
    index,
    value: Column,
    qfield: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """JoinDocFreqValueSource (JoinDocFreqValueSource.cs): per doc, read
    a term-valued expression off the document's stored fields and return
    that term's docFreq in ``qfield``'s dictionary; 0 when the term is
    absent (the reference's SeekExact-miss branch returns 0).

    The reference walks a per-reader FieldCache of the stored terms and
    seeks each into the target field's TermsEnum; here it is ONE left
    join of the docset against the term-stats frame — both sides are
    shuffle-partitioned on the term key (term_stats is vocabulary-sized,
    NOT forced broadcast; AQE promotes it when it is actually small)."""
    fld = qfield or index.default_field
    stats = index.term_stats
    if "field" in stats.columns:
        stats = stats.filter(F.col("field") == fld)
    stats = stats.select(F.col("term").alias("_jv"), F.col("df").cast("long").alias("_jdf"))
    return (
        docs.select(id_col, value.alias("_jv"))
        .join(stats, "_jv", "left")
        .select(id_col, F.coalesce(F.col("_jdf"), F.lit(0)).alias("value"))
    )


def ord_field_source(docs: DataFrame, field: str, id_col: str = "doc_id") -> DataFrame:
    """OrdFieldSource / ReverseOrdFieldSource (OrdFieldSource.cs,
    ReverseOrdFieldSource.cs): per-doc ordinal of the field's value among
    the lexicographically sorted distinct values, numbered from 1, and
    the reverse ordinal (rord of the greatest value = 1 — the reference
    doc's rord("pear")=1 example).

    The reference reads SortedDocValues ordinals from the FieldCache;
    here the distinct-value dictionary is built once (a tiny aggregate —
    the window runs over distinct values, not docs) and broadcast-joined
    back, so no global sort of the docset ever happens."""
    from pyspark.sql import Window

    vals = docs.select(F.col(field).alias("_v")).where(F.col("_v").isNotNull()).distinct()
    w = Window.orderBy("_v")
    dic = vals.select(
        "_v",
        F.row_number().over(w).cast("long").alias("ord"),
        (F.count(F.lit(1)).over(Window.partitionBy())
         - F.row_number().over(w) + 1).cast("long").alias("rord"),
    )
    return docs.select(id_col, F.col(field).alias("_v")).join(
        F.broadcast(dic), "_v"
    ).select(id_col, "ord", "rord")
