"""Classification over the index — the Lucene.Net.Classification module
re-expressed (src/Lucene.Net.Classification/):

- KNearestNeighborClassifier (KNearestNeighborClassifier.cs): score an
  OR-query of the input's terms, take the top-k hits, majority-vote their
  class labels.
- SimpleNaiveBayesClassifier (SimpleNaiveBayesClassifier.cs): per class c,
  log P(c) + sum over query terms t of log P(t|c) with add-one smoothing —
  all from the postings x class-label join (word counts per class).

Both are single-pass DataFrame plans; the per-class tallies are tiny
aggregates, never collected beyond the class list."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def knn_class_votes(
    searcher,
    terms: list[str],
    meta: DataFrame,
    class_col: str,
    k: int = 20,
) -> DataFrame:
    """(class, votes) among the top-k docs of the OR query — quantized
    scores + doc_id tie-break keep the k-set engine-deterministic."""
    from lucenenet_spark.search.queries import BooleanClause, BooleanQuery, Occur, TermQuery

    q = BooleanQuery(
        clauses=tuple(BooleanClause(TermQuery(t), Occur.SHOULD) for t in terms)
    )
    scored = searcher.scored(q).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    topk = scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(k)
    return (
        topk.join(meta.select("doc_id", class_col), "doc_id")
        .groupBy(class_col)
        .agg(F.count(F.lit(1)).alias("votes"))
    )


def knn_classify(searcher, terms: list[str], meta: DataFrame, class_col: str, k: int = 20) -> str | None:
    votes = knn_class_votes(searcher, terms, meta, class_col, k)
    rows = votes.orderBy(F.desc("votes"), F.asc(class_col)).limit(1).collect()
    return rows[0][class_col] if rows else None


def naive_bayes_class_scores(
    index,
    terms: list[str],
    meta: DataFrame,
    class_col: str,
    field: str | None = None,
) -> DataFrame:
    """(class, nb_q): quantized log-score
    ln(docs_c / N) + sum_t ln((tf(t,c) + 1) / (tokens_c + V)),
    nb_q = floor(s*10000+0.5).

    This is the TEXTBOOK multinomial naive Bayes with add-one smoothing —
    a deliberate deviation from the reference's
    SimpleNaiveBayesClassifier.cs, which counts per-word DOCUMENT hits
    (TotalHitCountCollector per word) and smooths with
    avgUniqueTermsPerDoc * docsWithC + |docsWithC| as the denominator.
    The classifier role (argmax over classes of prior x likelihood) and
    the add-one idea match; the sufficient statistics differ (sum(tf) vs
    doc hits), chosen because sum(tf) is a single map-side-combined
    aggregate here versus one collector pass per (word, class) there."""
    fld = field or index.default_field
    post = index.postings.filter(F.col("field") == fld).select("doc_id", "term", "tf")
    labeled = post.join(meta.select("doc_id", class_col), "doc_id")
    cls_tokens = labeled.groupBy(class_col).agg(F.sum("tf").alias("tokens_c"))
    cls_docs = meta.groupBy(class_col).agg(F.count(F.lit(1)).alias("docs_c"))
    n_docs = meta.count()
    vocab = index.term_stats.filter(F.col("field") == fld).count()
    tfc = (
        labeled.filter(F.col("term").isin(terms))
        .groupBy(class_col, "term")
        .agg(F.sum("tf").alias("tf_c"))
    )
    # one row per (class, query term) incl. zero counts: cross classes x terms
    classes = cls_docs.select(class_col)
    term_rows = classes.crossJoin(
        F.broadcast(
            meta.sparkSession.createDataFrame([(t,) for t in terms], "term string")
        )
    )
    full = (
        term_rows.join(tfc, [class_col, "term"], "left")
        .join(cls_tokens, class_col)
        .select(
            class_col,
            (
                F.log(
                    (F.coalesce(F.col("tf_c"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("tokens_c").cast("double") + F.lit(float(vocab)))
                )
            ).alias("ll"),
        )
    )
    return (
        full.groupBy(class_col)
        .agg(F.sum("ll").alias("ll_sum"))
        .join(cls_docs, class_col)
        .select(
            class_col,
            F.floor(
                (
                    F.log(F.col("docs_c").cast("double") / F.lit(float(n_docs)))
                    + F.col("ll_sum")
                )
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nb_q"),
        )
    )
