"""Accumulator-limited ranking — Moffat & Zobel, "Self-Indexing
Inverted Files for Fast Text Retrieval", ACM TOIS 1996 (the quit/
continue strategies): bound query-evaluation memory by capping the
number of document accumulators at L, processing query terms rarest
first so the cap is spent on the most selective evidence.

Semantics implemented (the *continue* strategy):

* terms are processed in (df ASC, term ASC) order — rarest first,
  exactly the Moffat-Zobel schedule;
* a document may only OPEN an accumulator while fewer than L are open;
  when a term's new documents would overflow the cap, the remaining
  slots go to the highest-impact new documents (contribution DESC,
  doc_id ASC);
* once the cap is reached no new accumulators open, but every OPEN
  accumulator keeps receiving contributions from later terms (continue,
  not quit) — so admitted documents carry their EXACT full OR score.

The sequential admission loop is re-expressed as one declarative
ranking: a doc's admission key is (rank of its FIRST matching term ASC,
contribution from that first term DESC, doc_id ASC), and the first L
docs under that order are exactly the set the sequential algorithm
admits — round r's admissions all sort before round r+1's, and within
a round the tie-break matches the per-round top-up.  That turns a
stateful scan into two windowed aggregations: no iteration, no driver
state, and the accumulator table is bounded at L rows per query — the
original paper's memory guarantee, which at 10^12 docs is the
difference between a bounded heap and an unbounded hash of every
matching doc.

Contributions are the searcher's quantized per-term BM25 partials
(bigint), so admission and final scores are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import TermQuery

__all__ = ["accumulator_limited_topk"]


def accumulator_limited_topk(
    searcher,
    terms,
    limit: int = 50,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """(rank, doc_id, first_term_rank, score_q): top-k of the OR query
    over ``terms`` under an L-accumulator budget (continue strategy)."""
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idx = searcher.index
    fld = field or idx.default_field
    # rarest-first schedule: (df ASC, term ASC)
    order = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term").isin(terms))
    ).select("term", "df")
    tw = Window.orderBy(F.asc("df"), F.asc("term"))
    sched = order.withColumn("term_rank", F.row_number().over(tw).cast("long")).drop(
        "df"
    )
    # per-(doc, term) quantized contributions, one scored pass per term
    # riding the searcher's shared scored() plan
    contribs = None
    for t in terms:
        c = searcher.scored(TermQuery(t, field=field)).select(
            "doc_id",
            F.lit(t).alias("term"),
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("c_q"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    contribs = contribs.join(F.broadcast(sched), "term")
    # admission key: first matching term's (rank, contribution)
    first = contribs.groupBy("doc_id").agg(
        F.min(F.struct(F.col("term_rank"), (-F.col("c_q")).alias("neg_c"))).alias("f")
    ).select(
        "doc_id",
        F.col("f.term_rank").alias("first_term_rank"),
        (-F.col("f.neg_c")).cast("long").alias("first_c_q"),
    )
    aw = Window.orderBy(
        F.asc("first_term_rank"), F.desc("first_c_q"), F.asc("doc_id")
    )
    admitted = (
        first.withColumn("_adm", F.row_number().over(aw))
        .filter(F.col("_adm") <= limit)
        .select("doc_id", "first_term_rank")
    )
    totals = (
        contribs.join(admitted, "doc_id")
        .groupBy("doc_id", "first_term_rank")
        .agg(F.sum("c_q").cast("long").alias("score_q"))
    )
    fw = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        totals.withColumn("rank", F.row_number().over(fw).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "first_term_rank", "score_q")
    )


def maxscore_topk(
    searcher,
    terms,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """MaxScore pruning (Turtle & Flood, "Query Evaluation: Strategies
    and Optimizations", Information Processing & Management 1995) for a
    disjunctive query, as a declarative exact-top-k plan:

    1. per-term max impact  m_t = max over docs of the quantized BM25
       partial (exact bigint);
    2. a PROVABLE threshold lower bound: theta = max over terms of the
       k-th best single-term score (every doc's OR score >= its
       single-term score, so the true k-th best OR score >= theta);
    3. sort terms by m_t ASC and prefix-sum: terms whose cumulative
       max-impact stays BELOW theta are NON-ESSENTIAL — a doc matching
       only those terms scores at most that cumulative sum and can
       never enter the top k;
    4. candidates = docs matching >= 1 ESSENTIAL term; their full OR
       scores (all terms' contributions) are summed and the top k
       returned.

    The result is rank- and score-identical to the unpruned OR — the
    MaxScore guarantee — while the candidate set skips every
    only-non-essential doc (for a web query with one rare and several
    stopword-scale terms, that is most of the corpus).  This is the
    TERM-level pruning complement to the BLOCK-level pruning in
    block_searcher.py (Ding & Suel's BMW builds on exactly this).
    All pruning arithmetic is integer: quantized impacts, integer
    prefix sums, integer theta.

    Output: (rank, doc_id, score_q) + audit columns (n_essential,
    n_terms) constant per row.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    contribs = None
    for t in terms:
        c = searcher.scored(TermQuery(t, field=field)).select(
            "doc_id",
            F.lit(t).alias("term"),
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("c_q"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    contribs = contribs.persist()
    # per-term kth-best single score (0 when the term has < k docs: no
    # bound can be claimed from it)
    pw = Window.partitionBy("term").orderBy(F.desc("c_q"), F.asc("doc_id"))
    kth = (
        contribs.withColumn("_r", F.row_number().over(pw))
        .filter(F.col("_r") == k)
        .groupBy()
        .agg(F.coalesce(F.max("c_q"), F.lit(0)).cast("long").alias("theta"))
    )
    maxi = contribs.groupBy("term").agg(F.max("c_q").cast("long").alias("m"))
    cw = Window.orderBy(F.asc("m"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    flags = (
        maxi.crossJoin(F.broadcast(kth))
        .withColumn("cum", F.sum("m").over(cw).cast("long"))
        .withColumn("essential", F.col("cum") >= F.col("theta"))
    )
    ess = flags.filter(F.col("essential")).select("term")
    n_ess = flags.agg(
        F.sum(F.when(F.col("essential"), 1).otherwise(0)).cast("long").alias("n_essential")
    )
    cand = (
        contribs.join(F.broadcast(ess), "term")
        .select("doc_id")
        .distinct()
    )
    totals = (
        contribs.join(cand, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum("c_q").cast("long").alias("score_q"))
    )
    fw = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        totals.withColumn("rank", F.row_number().over(fw).cast("long"))
        .filter(F.col("rank") <= k)
        .crossJoin(F.broadcast(n_ess))
        .select(
            "rank", "doc_id", "score_q", "n_essential",
            F.lit(len(terms)).cast("long").alias("n_terms"),
        )
    )


def impact_budget_topk(
    searcher,
    terms,
    budget: int = 200,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """Anytime impact-ordered evaluation (Anh & Moffat, "Pruned Query
    Evaluation Using Pre-Computed Impacts", SIGIR 2006): process
    postings in GLOBAL descending-impact order across all query terms
    and stop after ``budget`` postings — the fixed-latency serving mode
    where the index layout (impact-ordered lists) guarantees the most
    score mass lands inside any prefix of the work.

    Declarative form: rank the per-(doc, term) quantized contributions
    by (impact DESC, doc ASC, term ASC), keep the first ``budget``
    rows, sum per doc, take the top k.  The page carries
    exact_overlap = |budget page ∩ exact OR page| so the caller sees
    what the latency cap cost — at full budget it is k by construction.
    All integers; the prefix rule is a total order, so any engine
    replays the identical prefix.

    Output: (rank, doc_id, score_q, exact_overlap).
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if budget < 1 or k < 1:
        raise ValueError(f"need budget >= 1 and k >= 1, got {budget}/{k}")
    contribs = None
    for t in terms:
        c = searcher.scored(TermQuery(t, field=field)).select(
            "doc_id",
            F.lit(t).alias("term"),
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("c_q"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    contribs = contribs.persist()
    pw = Window.orderBy(F.desc("c_q"), F.asc("doc_id"), F.asc("term"))
    taken = contribs.withColumn("_p", F.row_number().over(pw)).filter(
        F.col("_p") <= budget
    )
    page_w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    page = (
        taken.groupBy("doc_id")
        .agg(F.sum("c_q").cast("long").alias("score_q"))
        .withColumn("rank", F.row_number().over(page_w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    exact = (
        contribs.groupBy("doc_id")
        .agg(F.sum("c_q").cast("long").alias("sq"))
        .withColumn("g", F.row_number().over(Window.orderBy(F.desc("sq"), F.asc("doc_id"))))
        .filter(F.col("g") <= k)
        .select(F.col("doc_id").alias("gdoc"))
    )
    ov = page.join(exact, page.doc_id == exact.gdoc).agg(
        F.count(F.lit(1)).cast("long").alias("exact_overlap")
    )
    return page.crossJoin(F.broadcast(ov)).select(
        "rank", "doc_id", "score_q", "exact_overlap"
    )
