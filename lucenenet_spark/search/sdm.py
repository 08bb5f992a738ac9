"""Sequential Dependence Model retrieval (Metzler & Croft, "A Markov
random field model for term dependencies", SIGIR 2005).

The standard strong baseline between bag-of-words and learned rankers:
a two-term query is scored by three Dirichlet-smoothed query-likelihood
features with the paper's (0.85, 0.1, 0.05) weights —

  f_T  : each term's unigram likelihood,
  f_O  : the EXACT ORDERED bigram "t1 t2" (adjacent, in order),
  f_U  : the UNORDERED co-occurrence of both terms within a window of
         8 positions —

so documents where the query terms actually appear together (and in
order) outrank bag-of-words ties.  Everything runs on the positional
postings this index already stores: the ordered count is one
array_intersect of shifted position lists, the window count one
flattened pairwise-difference filter — whole-stage codegen, no
explosion of (doc, pos) rows at query time.

Candidate set: documents matching EITHER term (missing features smooth
to their collection prior, exactly like the engine's other LM kernels).
Collection statistics for the window "pseudo-terms" (their total
corpus frequency) are aggregated from the same expressions — one extra
job, cacheable per query template at serving time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex

LAMBDA_T = 0.85
LAMBDA_O = 0.1
LAMBDA_U = 0.05
UW_WIN = 8  # unordered window size (uw8 of the paper)


def _ordered_count(p1, p2):
    """# positions where t1 at x is immediately followed by t2 at x+1."""
    return F.size(
        F.array_intersect(F.transform(p1, lambda x: x + F.lit(1)), p2)
    ).cast("long")


def _unordered_count(p1, p2, win: int = UW_WIN):
    """# (i, j) pairs with |pos_i - pos_j| < win (both orders counted
    once — the pair, not the ordering, is the event)."""
    diffs = F.flatten(F.transform(p1, lambda x: F.transform(p2, lambda y: y - x)))
    return F.size(
        F.filter(diffs, lambda d: (d > F.lit(-win)) & (d < F.lit(win)))
    ).cast("long")


def sdm_topk(
    idx: InvertedIndex,
    t1: str,
    t2: str,
    k: int = 10,
    mu: float = 2500.0,
    field: str | None = None,
) -> DataFrame:
    """Top-k SDM scores for the two-term query (t1, t2).

    Output (rank, doc_id, score_q4) with score quantized 1e4; ordering
    (score_q4 DESC, doc_id ASC).
    """
    fld = field or idx.default_field
    post = idx.postings.filter(F.col("field") == fld)
    p1 = post.filter(F.col("term") == t1).select(
        "doc_id", F.col("tf").alias("tf1"), F.col("positions").alias("pos1")
    )
    p2 = post.filter(F.col("term") == t2).select(
        "doc_id", F.col("tf").alias("tf2"), F.col("positions").alias("pos2")
    )
    both = p1.join(p2, "doc_id", "full_outer")
    dls = idx.doclens.filter(F.col("field") == fld).select("doc_id", "dl")
    cand = both.join(dls, "doc_id").select(
        "doc_id",
        F.col("dl").cast("double").alias("dl"),
        F.coalesce("tf1", F.lit(0)).cast("long").alias("tf1"),
        F.coalesce("tf2", F.lit(0)).cast("long").alias("tf2"),
        F.coalesce(
            _ordered_count(F.col("pos1"), F.col("pos2")), F.lit(0)
        ).alias("c_o"),
        F.coalesce(
            _unordered_count(F.col("pos1"), F.col("pos2")), F.lit(0)
        ).alias("c_u"),
    )
    # collection stats: unigram cf from term_stats; window cf aggregated
    # from the same per-doc counts
    stats = {
        r["term"]: int(r["ttf"])
        for r in idx.term_stats.filter(
            (F.col("field") == fld) & (F.col("term").isin([t1, t2]))
        ).collect()
    }
    cf1, cf2 = float(stats.get(t1, 0)), float(stats.get(t2, 0))
    wtotals = cand.agg(
        F.sum("c_o").cast("long").alias("cfo"), F.sum("c_u").cast("long").alias("cfu")
    ).collect()[0]
    cfo, cfu = float(wtotals["cfo"]), float(wtotals["cfu"])
    csize = float(idx._sttf(fld))

    def _feat(c_col, cf: float):
        # Dirichlet query likelihood; an unseen collection event takes
        # the 0.5-occurrence floor so its log stays finite
        prior = max(cf, 0.5) / csize
        return F.log(
            (c_col.cast("double") + F.lit(mu) * F.lit(prior))
            / (F.col("dl") + F.lit(mu))
        )

    score = (
        F.lit(LAMBDA_T) * (_feat(F.col("tf1"), cf1) + _feat(F.col("tf2"), cf2))
        + F.lit(LAMBDA_O) * _feat(F.col("c_o"), cfo)
        + F.lit(LAMBDA_U) * _feat(F.col("c_u"), cfu)
    )
    scored = cand.select(
        "doc_id",
        F.floor(score * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q4"),
    )
    w = Window.orderBy(F.desc("score_q4"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score_q4")
    )
