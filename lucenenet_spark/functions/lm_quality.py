"""Unigram language-model quality scoring (CCNet-style LM filtering).

The published Common-Crawl curation pipelines (CCNet, Wenzek et al.
2020) rank documents by language-model perplexity and drop the worst
tail. The full KenLM stage needs a trained model; the honest in-engine
analogue is the corpus's own unigram model: a document's mean token
log-probability under the collection's term distribution. Gibberish and
boilerplate-heavy documents score low; typical prose scores near the
corpus mode — the same filtering shape with a model the engine already
has (term_stats IS the unigram table).

Scale design: one groupBy(term) over the corpus builds the frequency
table (the index build already materializes the same aggregation —
pass `freq` to reuse it); the per-doc score is explode + shuffle join
on the token key + one groupBy(doc). No driver collects — the corpus
total rides along as a broadcast single-row cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    freq: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, avg_logprob_q): mean ln P(token) per document under
    the corpus unigram distribution, quantized 1e-4 (negative; closer to
    0 = more typical). ``freq`` may supply a precomputed (w, cnt) table
    (e.g. derived from index term_stats ttf) to skip the corpus pass."""
    toks = df.select(
        id_col, F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
    )
    if freq is None:
        freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("_total"))
    scored = (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .select(id_col, F.ln(F.col("cnt") / F.col("_total")).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.floor(F.avg("lp") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias(
            "avg_logprob_q"
        ),
    )


def lm_quality_filter(
    df: DataFrame,
    min_avg_logprob: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose mean unigram log-prob clears the threshold
    (the CCNet head/middle cut, with the corpus itself as the model)."""
    import math

    stats = unigram_logprob(df, text_col=text_col, id_col=id_col)
    # floor, not int(): log-probs are negative and int() truncates toward
    # zero, which would silently tighten the threshold by one quantum
    keep = stats.filter(
        F.col("avg_logprob_q") >= math.floor(min_avg_logprob * 10000)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")
