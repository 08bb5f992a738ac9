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


def boolean_perceptron_weights(
    post: DataFrame,
    labels: DataFrame,
    threshold2: "F.Column | int",
    epochs: int = 2,
) -> DataFrame:
    """Train BooleanPerceptronClassifier weights, batch-synchronously.

    Reference: src/Lucene.Net.Classification/BooleanPerceptronClassifier.cs
    — a perceptron over the term->tf vectors of the training docs with a
    boolean class label; weights start at zero, misclassified docs add
    (+tf) for positive / (-tf) for negative to every term they contain,
    and a doc is predicted positive when sum(w[t]*tf) >= threshold.

    DELIBERATE DEVIATION: the reference updates ONLINE, doc by doc in index
    order — inherently sequential. Here each epoch scores ALL docs against
    the frozen epoch-start weights, then applies the summed updates of every
    misclassified doc at once (the classic batch/parallel perceptron). Same
    hypothesis class and update rule; the update SCHEDULE is epoch-
    synchronous so the whole pass is two shuffles (score groupBy doc_id,
    update groupBy term) regardless of corpus size.

    All arithmetic is integer (tf and weights are longs; `threshold2` is
    TWICE the threshold so `2*score >= threshold2` avoids fractions),
    making results bit-stable across engines.

    post:    (doc_id, term, tf) training postings.
    labels:  (doc_id, y boolean) training labels.
    Returns: (term, w long) — only terms with nonzero training touches.
    """
    spark = post.sparkSession
    w: DataFrame | None = None
    for _ in range(epochs):
        if w is None:
            scores = labels.select("doc_id", F.lit(0).cast("long").alias("score"))
        else:
            scores = (
                post.join(w, "term")
                .groupBy("doc_id")
                .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
            )
        pred = labels.join(scores, "doc_id", "left").select(
            "doc_id",
            "y",
            (F.coalesce(F.col("score"), F.lit(0)) * 2 >= threshold2).alias("p"),
        )
        mis = pred.filter(F.col("p") != F.col("y")).select("doc_id", "y")
        delta = (
            post.join(mis, "doc_id")
            .groupBy("term")
            .agg(
                F.sum(
                    F.when(F.col("y"), F.col("tf")).otherwise(-F.col("tf"))
                ).alias("d")
            )
        )
        if w is None:
            w = delta.select("term", F.col("d").cast("long").alias("w"))
        else:
            w = (
                w.join(delta, "term", "outer")
                .select(
                    "term",
                    (
                        F.coalesce(F.col("w"), F.lit(0))
                        + F.coalesce(F.col("d"), F.lit(0))
                    ).cast("long").alias("w"),
                )
            )
        # weights table is vocabulary-sized; keep it materialized so the
        # next epoch's two joins don't replay the whole training lineage
        w = w.localCheckpoint(eager=True)
    assert w is not None
    return w


def boolean_perceptron_classify(
    post: DataFrame,
    docs: DataFrame,
    weights: DataFrame,
    threshold2: "F.Column | int",
) -> DataFrame:
    """Apply trained perceptron weights: (doc_id, pred boolean) for every
    doc in `docs` (docs absent from `post` or matching no weighted term
    score 0). One postings x weights join + per-doc sum — the weights side
    shuffles by term exactly like a scored term query."""
    scores = (
        post.join(docs.select("doc_id"), "doc_id")
        .join(weights, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("score"))
    )
    return docs.select("doc_id").join(scores, "doc_id", "left").select(
        "doc_id",
        (F.coalesce(F.col("score"), F.lit(0)) * 2 >= threshold2).alias("pred"),
    )
