"""Sandbox queries re-expressed Spark-first.

Covers the remaining ``Lucene.Net.Sandbox/Queries`` surface
(DuplicateFilter already lives in functions/dedup.py):

- :func:`slow_fuzzy_rewrite` ≙ ``SlowFuzzyQuery`` + ``SlowFuzzyTermsEnum``
  — the pre-4.0 similarity-threshold fuzzy match: candidates are ranked
  by ``similarity = 1 - distance / (prefixLength + min(textlen,
  targetlen))`` and kept when ``similarity > minSimilarity``, with boost
  ``(similarity - minSimilarity) / (1 - minSimilarity)``
  (``SlowFuzzyTermsEnum.cs:119,148``; scale factor from the ctor). The
  distance is plain Levenshtein (``SlowFuzzyTermsEnum.cs:178`` LevenshteinDistance),
  which Spark and DuckDB both ship natively, so candidate generation is
  a JVM-side length-banded dictionary scan — same plan as FuzzyQuery's.
- :func:`fuzzy_like_this` ≙ ``FuzzyLikeThisQuery`` — fuzzifies every
  analyzed term of a free-text string, ranks variants per source term by
  similarity boost, folds in the SOURCE term's idf (variants share the
  source idf so misspellings aren't over-rewarded —
  ``FuzzyLikeThisQuery.cs:229`` "store the df so all variants use same
  idf"; df falls back to the variants' average when the source term is
  absent, ``:337``), keeps the global top ``maxNumTerms`` scored
  ``boost^2 * idf(df, N)`` with ``idf = ln(N/(df+1)) + 1``
  (``DefaultSimilarity.cs:158``), and emits a flat SHOULD query whose
  per-doc score is the sum of matched variants' boosts (the reference's
  ``ignoreTF`` ConstantScore path, ``FuzzyLikeThisQuery.cs:318,329``; the
  tf-sensitive path instead multiplies each boost into the engine's
  BM25 term score — a documented scoring-model substitution).
- :func:`sorted_set_sort_field` ≙ ``SortedSetSortField`` +
  ``SortedSetSelector`` MIN/MAX/MIDDLE_MIN/MIDDLE_MAX — order docs by
  the selected value of a multivalued string field, a single groupBy
  aggregation feeding TakeOrdered. The middle selectors pick the
  middle ord of the doc's sorted distinct value set; with an even
  count MIDDLE_MIN takes the lower of the two middles (0-based index
  ``(count-1)/2``) and MIDDLE_MAX the upper (``count/2``) —
  ``SortedSetSelector.cs`` MIDDLE_MIN/MIDDLE_MAX.
- :func:`terms_filter` ≙ ``Queries/TermsFilter.cs`` — match-any-of-N
  set filter as an IN-list pushdown over the postings (no per-term
  scan fan-out; one predicate, one distinct).

Selection order everywhere uses QUANTIZED scores (floor(x*1e6+0.5),
term tie-break) so the chosen variant SET is reproducible bit-for-bit
by the DuckDB oracle — the same convention as the MoreLikeThis gate.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    Occur,
    Query,
    TermQuery,
)

__all__ = [
    "SlowFuzzyQuery",
    "slow_fuzzy_rewrite",
    "fuzzy_like_this",
    "sorted_set_sort_field",
    "terms_filter",
]

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.cs:58


@dataclass(frozen=True)
class SlowFuzzyQuery(Query):
    """Similarity-threshold fuzzy query (SlowFuzzyQuery.cs:36; default
    minimumSimilarity=0.5, prefixLength=0)."""

    term: str = ""
    min_similarity: float = 0.5
    prefix_length: int = 0
    max_expansions: int = 50
    field: str | None = None


def _sim_boost_cols(target: str, min_sim: float, prefix_length: int):
    """(similarity, boost) Columns over a `term` column, mirroring
    SlowFuzzyTermsEnum.CalcSimilarity + BoostAttribute."""
    pfx = prefix_length
    tlen = len(target) - pfx
    d = F.levenshtein(F.expr(f"substring(term, {pfx + 1})"), F.lit(target[pfx:]))
    denom = F.lit(pfx) + F.least(F.length("term") - pfx, F.lit(tlen))
    sim = F.lit(1.0) - d.cast("double") / denom.cast("double")
    boost = (sim - F.lit(min_sim)) / F.lit(1.0 - min_sim)
    return sim, boost


def _q6(col):
    return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")


def slow_fuzzy_candidates(
    term_stats: DataFrame,
    target: str,
    *,
    field: str = "text",
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_expansions: int = 50,
) -> list[tuple[str, float, int]]:
    """Collect the top-`max_expansions` (term, boost, df) variants whose
    similarity exceeds the threshold. The scan is length-banded: with
    similarity > s, distance < (1-s) * min-length, so candidate lengths
    are bounded both ways — the same pushdown window FuzzyQuery uses."""
    if not 0.0 <= min_similarity < 1.0:
        raise ValueError("min_similarity must be in [0, 1)")
    tlen = len(target)
    # d < (1-s)*min(len) and min(len) <= tlen  =>  d <= ceil((1-s)*tlen)
    dmax = int(math.ceil((1.0 - min_similarity) * tlen))
    sim, boost = _sim_boost_cols(target, min_similarity, prefix_length)
    base = term_stats.filter(
        (F.col("field") == field)
        & (F.length("term") >= tlen - dmax)
        & (F.length("term") <= tlen + dmax)
    )
    if prefix_length > 0:
        base = base.filter(F.col("term").startswith(target[:prefix_length]))
    rows = (
        base.withColumn("sim", sim)
        .withColumn("boost", boost)
        .filter(F.col("sim") > F.lit(min_similarity))
        .select("term", "boost", F.col("df").cast("long").alias("df"))
        .orderBy(_q6(F.col("boost")).desc(), F.col("term").asc())
        .limit(max_expansions)
        .collect()
    )
    return [(r["term"], float(r["boost"]), int(r["df"])) for r in rows]


def slow_fuzzy_rewrite(searcher, q: SlowFuzzyQuery) -> Query:
    """SlowFuzzyQuery -> boosted OR over threshold-passing variants
    (TopTermsScoringBooleanQueryRewrite shape, like FuzzyQuery's)."""
    fld = q.field or searcher.index.default_field
    top = slow_fuzzy_candidates(
        searcher.index.term_stats,
        q.term,
        field=fld,
        min_similarity=q.min_similarity,
        prefix_length=q.prefix_length,
        max_expansions=q.max_expansions,
    )
    if not top:
        return TermQuery(q.term + "\x00_nomatch", field=fld, boost=q.boost)
    return BooleanQuery(
        clauses=tuple(
            BooleanClause(TermQuery(term, field=fld, boost=boost), Occur.SHOULD)
            for term, boost, _df in top
        ),
        boost=q.boost,
    )


def fuzzy_like_this(
    searcher,
    query_string: str,
    *,
    field: str = "text",
    min_similarity: float = 0.5,
    prefix_length: int = 0,
    max_num_terms: int = 10,
    analyzer=None,
    ignore_tf: bool = True,
) -> DataFrame:
    """FuzzyLikeThisQuery end-to-end: returns (doc_id, score) where score
    sums the selected variants' final boosts per matching doc (ignore_tf
    ConstantScore semantics) or boost-weighted BM25 term scores."""
    if analyzer is None:
        from lucenenet_spark.analysis.analyzers import StandardAnalyzer

        analyzer = StandardAnalyzer()
    idx = searcher.index
    n_docs = idx.max_doc
    source_terms: list[str] = []
    for term, _pos in analyzer.tokenize_text(query_string):
        if term and term not in source_terms:
            source_terms.append(term)

    df_by_term = {
        r["term"]: int(r["df"])
        for r in idx.term_stats.filter(
            (F.col("field") == field) & F.col("term").isin(source_terms)
        )
        .select("term", "df")
        .collect()
    }

    scored: list[tuple[float, str]] = []  # (final_score, variant_term)
    for src in source_terms:
        variants = slow_fuzzy_candidates(
            idx.term_stats,
            src,
            field=field,
            min_similarity=min_similarity,
            prefix_length=prefix_length,
            max_expansions=MAX_VARIANTS_PER_TERM,
        )
        if not variants:
            continue
        df = df_by_term.get(src, 0)
        if df == 0:
            df = sum(v[2] for v in variants) // len(variants)  # avg variant df
        idf = math.log(n_docs / (df + 1)) + 1.0
        for term, boost, _vdf in variants:
            scored.append((boost * boost * idf, term))

    # global top maxNumTerms on quantized score, term tie-break
    scored.sort(key=lambda x: (-math.floor(x[0] * 1e6 + 0.5), x[1]))
    top = scored[:max_num_terms]
    if not top:
        spark = idx.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")

    spark = idx.postings.sparkSession
    boosts = spark.createDataFrame(
        [(t, s) for s, t in top], "term string, vboost double"
    )
    post = idx.postings.filter(F.col("field") == field)
    if ignore_tf:
        # ConstantScoreQuery path: each matched variant contributes its boost
        return (
            post.join(F.broadcast(boosts), "term")
            .groupBy("doc_id")
            .agg(F.sum("vboost").alias("score"))
        )
    per_term = searcher.scored(
        BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(t, field=field, boost=s), Occur.SHOULD)
                for s, t in top
            )
        )
    )
    return per_term


def sorted_set_sort_field(
    doc_values: DataFrame,
    *,
    value_col: str,
    id_col: str = "doc_id",
    selector: str = "min",
    ascending: bool = True,
    k: int = 20,
) -> DataFrame:
    """SortedSetSortField: order docs by the selected value of a
    multivalued field (selector in min/max/middle_min/middle_max).
    Accepts either one row per (doc, value) or an array column; emits
    (doc_id, sort_key) top-k. One partial-aggregated groupBy then
    TakeOrdered — no global sort. The middle selectors need the doc's
    full sorted distinct value set, so their aggregate is a collect_set
    (bounded by the field's per-doc value count, tiny for real
    SortedSet fields); min/max stay a plain partial-aggregated min/max."""
    if selector not in ("min", "max", "middle_min", "middle_max"):
        raise ValueError(
            "selector must be min/max/middle_min/middle_max (SortedSetSelector.Type)"
        )
    from pyspark.sql.types import ArrayType

    def _middle(arr):
        n = F.size(arr)
        # 0-based middle ord: (n-1)/2 for MIDDLE_MIN, n/2 for MIDDLE_MAX
        # (SortedSetSelector.cs) -> 1-based element_at.
        idx = (n - F.lit(1)) if selector == "middle_min" else n
        return F.element_at(arr, (F.floor(idx / F.lit(2)) + F.lit(1)).cast("int"))

    schema = dict((f.name, f.dataType) for f in doc_values.schema.fields)
    if isinstance(schema.get(value_col), ArrayType):
        arr = F.array_sort(F.array_distinct(F.col(value_col)))
        if selector == "min":
            key = F.array_min(F.col(value_col))
        elif selector == "max":
            key = F.array_max(F.col(value_col))
        else:
            key = _middle(arr)
        per_doc = doc_values.select(F.col(id_col), key.alias("sort_key"))
    elif selector in ("min", "max"):
        agg = (F.min if selector == "min" else F.max)(F.col(value_col))
        per_doc = doc_values.groupBy(id_col).agg(agg.alias("sort_key"))
    else:
        per_doc = doc_values.groupBy(id_col).agg(
            _middle(F.array_sort(F.collect_set(F.col(value_col)))).alias("sort_key")
        )
    order = F.col("sort_key").asc() if ascending else F.col("sort_key").desc()
    return per_doc.orderBy(order, F.col(id_col).asc()).limit(k)


def terms_filter(index, terms: list[str], *, field: str = "text") -> DataFrame:
    """TermsFilter: docs matching ANY of the given terms, as one IN-list
    predicate over the postings (pushdown-friendly; the reference builds
    a sorted DocIdSet union, TermsFilter.cs GetDocIdSet)."""
    return (
        index.postings.filter(
            (F.col("field") == field) & F.col("term").isin(list(terms))
        )
        .select("doc_id")
        .distinct()
    )
