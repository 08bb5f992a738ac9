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


def bigram_logprob(
    df: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """Stupid-Backoff bigram LM document scoring (Brants, Popat, Xu,
    Och, Dean, EMNLP'07 "Large Language Models in Machine Translation"
    — the backoff score designed FOR distributed count tables):

        S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if bigram seen
                         = alpha * c(w_i) / T             otherwise
        (OOV unigrams score as hapax: alpha * 1 / T)

    Returns (id_col, n_bigrams, avg_logprob_q): mean ln S over the
    document's adjacent token pairs, quantized 1e-4. ``train`` supplies
    the count corpus (defaults to ``df`` itself — then every bigram is
    seen and the backoff never fires; pass a held-out split to exercise
    it, the CCNet "score the crawl under a reference model" shape).

    Scale: the bigram count table is one groupBy over exploded adjacent
    pairs (map-side combinable); scoring is explode + two hash joins on
    token keys + one groupBy(doc). The unigram/total tables ride along
    broadcast-small or as ordinary shuffle joins — no driver state.
    Docs with fewer than 2 tokens have no bigram events and are absent
    from the result (callers treat them as unscorable, like CCNet)."""
    if train is None:
        train = df

    def _pairs(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            id_col,
            F.array_remove(F.split(F.col(text_col), " "), "").alias("t"),
        ).filter(F.size("t") >= 2)
        # slice(t, 2, ...) are tokens 2..L (1-based); lambda index i is
        # 0-based within the slice, so t[i] (0-based) is the predecessor
        return toks.select(
            id_col,
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> struct(t[i] AS w1, w AS w2))"
                )
            ).alias("p"),
        ).select(id_col, "p.w1", "p.w2")

    train_toks = train.select(
        F.explode(
            F.array_remove(F.split(F.col(text_col), " "), "")
        ).alias("w")
    )
    # uni feeds the c1 join, the c2 join, AND the total agg — persist so
    # the training-corpus scan runs once, not three times
    uni = train_toks.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).persist()
    big = (
        _pairs(train)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    total = uni.agg(F.sum("cnt").cast("double").alias("_total"))
    scored = (
        _pairs(df)
        .join(big, ["w1", "w2"], "left")
        .join(uni.select(F.col("w").alias("w1"), F.col("cnt").alias("c1")), "w1", "left")
        .join(uni.select(F.col("w").alias("w2"), F.col("cnt").alias("c2")), "w2", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.ln(
                F.when(F.col("cb").isNotNull(), F.col("cb") / F.col("c1")).otherwise(
                    F.lit(alpha) * F.coalesce(F.col("c2"), F.lit(1)) / F.col("_total")
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.avg("lp") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias(
            "avg_logprob_q"
        ),
    )


def lm_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
) -> DataFrame:
    """CCNet head/middle/tail bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    rank documents by LM score within each language and split into
    ``n_buckets`` equal-frequency buckets — bucket 1 = head (most
    LM-typical), bucket n = tail (dropped or down-weighted by the
    published pipeline). Returns (id_col, lang_col?, n_tokens,
    avg_logprob_q, bucket).

    The rank is a window over (lang, score) — one shuffle on the
    language key; at 100 TB the per-language partitions are the natural
    parallel unit and skew (English) is handled by AQE. The ordering is
    total (score desc, then id) so the bucket assignment is
    deterministic and oracle-checkable."""
    from pyspark.sql import Window

    stats = unigram_logprob(df, text_col=text_col, id_col=id_col)
    cols = [id_col] + ([lang_col] if lang_col else [])
    joined = df.select(*cols).join(stats, id_col)
    part = Window.partitionBy(lang_col) if lang_col else Window.partitionBy()
    w = part.orderBy(F.col("avg_logprob_q").desc(), F.col(id_col).asc())
    return joined.select(
        *cols,
        "n_tokens",
        "avg_logprob_q",
        F.ntile(n_buckets).over(w).cast("long").alias("bucket"),
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


def kneser_ney_bigram_logprob(
    df: DataFrame,
    train: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney, ICASSP
    1995; the interpolated form of Chen & Goodman, "An Empirical Study
    of Smoothing Techniques for Language Modeling", 1998 §2.7) — the
    strongest classical n-gram smoother, and the quality filter CCNet's
    "wikipedia-perplexity" buckets approximate:

        P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1·)
                      + (D · N1+(w1 ·) / c(w1·)) · (N1+(· w2) / N1+(· ·))

    where c(w1·) = Σ_w2 c(w1 w2) is the CONTEXT count, N1+(w1 ·) the
    distinct continuations of w1, N1+(· w2) the distinct contexts of w2
    (the continuation probability — "how novel is w2", the KN insight
    that 'francisco' follows many tokens badly), and N1+(· ·) the total
    bigram type count.  D = 0.75 is the standard absolute discount.

    All five count tables come from TWO aggregations over the exploded
    adjacent-pair stream (raw whitespace tokens, bigram_logprob's
    convention); per-pair ln P is quantized to a q6 integer BEFORE the
    per-document sum, so results are bit-stable across engines and
    partitionings.  Pairs whose context w1 never occurs as a context in
    ``train`` are unscorable (division by c=0) and are dropped (as are pairs scoring exactly 0);
    n_bigrams counts scored pairs only.  Output:
    (id_col, n_bigrams, sum_lp_q6).

    Scale: explode + two groupBys (map-side combinable) + hash joins on
    token keys; the type-count scalars ride broadcast.  No driver state,
    no per-row Python.
    """
    if train is None:
        train = df

    def _pairs(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            id_col,
            F.array_remove(F.split(F.col(text_col), " "), "").alias("t"),
        ).filter(F.size("t") >= 2)
        return toks.select(
            id_col,
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> struct(t[i] AS w1, w AS w2))"
                )
            ).alias("p"),
        ).select(id_col, "p.w1", "p.w2")

    big = (
        _pairs(train)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
        .persist()
    )
    ctx = big.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),  # N1+(w1 ·)
    )
    cont = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1b")  # N1+(· w2)
    )
    ntypes = big.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    d = float(discount)
    p_kn = (
        F.greatest(F.col("cb").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c1").cast("double")
        + (F.lit(d) * F.col("n1f").cast("double") / F.col("c1").cast("double"))
        * (F.col("n1b").cast("double") / F.col("nt").cast("double"))
    )
    scored = (
        _pairs(df)
        .join(big.withColumnRenamed("cb", "cb_s"), ["w1", "w2"], "left")
        .withColumn("cb", F.coalesce(F.col("cb_s"), F.lit(0)).cast("long"))
        .join(ctx, "w1")  # inner: unseen contexts are unscorable
        .join(cont, "w2", "left")
        .withColumn("n1b", F.coalesce(F.col("n1b"), F.lit(0)).cast("long"))
        # cb=0 AND n1b=0 => P_KN = 0 exactly (ln undefined): unscorable
        .filter((F.col("cb") > 0) | (F.col("n1b") > 0))
        .crossJoin(F.broadcast(ntypes))
        .select(
            id_col,
            F.floor(F.log(p_kn) * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("lp_q6"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_q6").cast("long").alias("sum_lp_q6"),
    )


def context_spell_correct(
    docs: DataFrame,
    prev_word: str,
    misspelled: str,
    k: int = 5,
    max_edits: int = 2,
    edit_penalty_q6: int = 5000000,
    discount: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Context-sensitive "did you mean" correction via the noisy-channel
    decomposition (Kernighan, Church & Gale, COLING 1990; Brill & Moore
    ACL 2000): rank replacement candidates c for ``misspelled`` by

        score = ln P_KN(c | prev_word)  -  penalty * edits(c, misspelled)

    i.e. a channel model (uniform per-edit cost) times the interpolated
    Kneser-Ney bigram source model — the context step DirectSpellChecker
    lacks (reference: Lucene.Net.Suggest/Spell/DirectSpellChecker.cs
    ranks by isolated-term edit distance + docFreq only; this adds the
    left-context language model).

    Candidate generation follows the scale discipline of the fuzzy-query
    rework: a LENGTH-BAND prefilter (abs(len(w) - len(q)) <= max_edits)
    pushes down BEFORE the O(|w|*|q|) levenshtein compute, so the term
    dictionary is pruned by the cheap predicate first.  All scoring is
    integer (lp quantized q6, integer edit distances, integer penalty);
    ties break on candidate ASC.

    Output: (rank, candidate, dist, lp_q6, score_q6), top-k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _pairs(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            F.array_remove(F.split(F.col(text_col), " "), "").alias("t")
        ).filter(F.size("t") >= 2)
        return toks.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> struct(t[i] AS w1, w AS w2))"
                )
            ).alias("p")
        ).select("p.w1", "p.w2")

    big = (
        _pairs(docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
        .persist()
    )
    ctx = big.filter(F.col("w1") == prev_word).groupBy("w1").agg(
        F.sum("cb").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    ntypes = big.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    vocab = (
        docs.select(
            F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
        )
        .distinct()
        # length band FIRST: the pushdown-friendly prefilter
        .filter(
            F.abs(F.length("w") - F.lit(len(misspelled))) <= max_edits
        )
        .withColumn("dist", F.levenshtein(F.col("w"), F.lit(misspelled)).cast("long"))
        .filter(F.col("dist") <= max_edits)
    )
    d = float(discount)
    cand = (
        vocab.join(
            big.filter(F.col("w1") == prev_word).select(
                F.col("w2").alias("w"), "cb"
            ),
            "w",
            "left",
        )
        .withColumn("cb", F.coalesce(F.col("cb"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(ctx))
        .join(cont.withColumnRenamed("w2", "w"), "w", "left")
        .withColumn("n1b", F.coalesce(F.col("n1b"), F.lit(0)).cast("long"))
        .filter((F.col("cb") > 0) | (F.col("n1b") > 0))
        .crossJoin(F.broadcast(ntypes))
    )
    p_kn = (
        F.greatest(F.col("cb").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c1").cast("double")
        + (F.lit(d) * F.col("n1f").cast("double") / F.col("c1").cast("double"))
        * (F.col("n1b").cast("double") / F.col("nt").cast("double"))
    )
    scored = cand.select(
        F.col("w").alias("candidate"),
        "dist",
        F.floor(F.log(p_kn) * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("lp_q6"),
    ).withColumn(
        "score_q6",
        (F.col("lp_q6") - F.lit(int(edit_penalty_q6)) * F.col("dist")).cast("long"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_q6"), F.asc("candidate"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "candidate", "dist", "lp_q6", "score_q6")
    )


def katz_backoff_bigram_logprob(
    df: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_cut: int = 5,
) -> DataFrame:
    """Katz back-off bigram scoring (Katz, "Estimation of
    Probabilities from Sparse Data for the Language Model Component of
    a Speech Recognizer", IEEE TASSP 1987), the Good-Turing-discounted
    back-off that completes this module's smoothing family (stupid
    backoff -> interpolated KN -> Katz):

        P(w2|w1) = d(c12) · c12 / c1                  if c12 > 0
                 = alpha(w1) · cnt(w2) / T            otherwise

        d(r)     = r*/r = (r+1)·N_{r+1} / (N_r · r)   for r < k_cut and
                   N_{r+1} > 0, else 1 (reliable / inestimable counts
                   undiscounted — the Gale & Sampson simple-GT choice)
        alpha(w1) = (1 - Σ_seen d·c12/c1) / (1 - Σ_seen cnt(w2)/T)

    Determinism: every per-continuation probability is quantized to a
    q12 integer BEFORE the per-context sums that feed alpha, so alpha
    is a ratio of exact integers; per-pair ln P is quantized q6 before
    the per-doc sum.  Pairs whose w1 is not a training context or (for
    the back-off path) whose w2 is outside the training vocabulary are
    unscorable and dropped.

    Output: (id_col, n_bigrams, sum_lp_q6).  Score a HELD-OUT split
    against a training split to exercise the back-off path.
    """
    if k_cut < 2:
        raise ValueError(f"k_cut must be >= 2, got {k_cut}")
    Q12 = 1000000000000.0

    def _pairs(frame: DataFrame) -> DataFrame:
        toks = frame.select(
            id_col,
            F.array_remove(F.split(F.col(text_col), " "), "").alias("t"),
        ).filter(F.size("t") >= 2)
        return toks.select(
            id_col,
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> struct(t[i] AS w1, w AS w2))"
                )
            ).alias("p"),
        ).select(id_col, "p.w1", "p.w2")

    big = (
        _pairs(train)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
        .persist()
    )
    ctx = big.groupBy("w1").agg(F.sum("cb").cast("long").alias("c1"))
    uni = (
        train.select(
            F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    tot = uni.agg(F.sum("cnt").cast("long").alias("t_tok"))
    nr = big.groupBy("cb").agg(F.count(F.lit(1)).cast("long").alias("n_r")).select(
        F.col("cb").alias("r"), "n_r"
    )
    # discount per observed r: d(r) = (r+1) N_{r+1} / (N_r r), gated
    disc = (
        nr.join(nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1")), "r", "left")
        .select(
            "r",
            F.when(
                (F.col("r") < k_cut) & F.col("n_r1").isNotNull(),
                (F.col("r") + F.lit(1)).cast("double")
                * F.col("n_r1").cast("double")
                / (F.col("n_r").cast("double") * F.col("r").cast("double")),
            )
            .otherwise(F.lit(1.0))
            .alias("d"),
        )
    )
    seen = (
        big.join(disc, big.cb == disc.r)
        .join(ctx, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "cb",
            "c1",
            F.floor(
                F.col("d") * F.col("cb").cast("double") / F.col("c1").cast("double")
                * F.lit(Q12)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pseen_q12"),
            F.floor(
                F.col("cnt").cast("double") / F.col("t_tok").cast("double") * F.lit(Q12)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pml_q12"),
        )
        .persist()
    )
    alpha = seen.groupBy("w1").agg(
        (F.lit(int(Q12)) - F.sum("pseen_q12")).cast("long").alias("left_q12"),
        (F.lit(int(Q12)) - F.sum("pml_q12")).cast("long").alias("den_q12"),
    )
    test = _pairs(df)
    scored = (
        test.join(seen.select("w1", "w2", "pseen_q12"), ["w1", "w2"], "left")
        .join(alpha, "w1")  # inner: unseen contexts unscorable
        .join(uni.withColumnRenamed("w", "w2"), "w2", "left")
        .crossJoin(F.broadcast(tot))
        # back-off path needs freed mass: contexts with no discounting
        # (left <= 0) or saturated unigram cover (den <= 0) give the
        # unseen pair P = 0 -> unscorable, dropped like the KN zeros
        .filter(
            F.col("pseen_q12").isNotNull()
            | (
                F.col("cnt").isNotNull()
                & (F.col("left_q12") > 0)
                & (F.col("den_q12") > 0)
            )
        )
        .select(
            id_col,
            F.floor(
                F.log(
                    F.when(
                        F.col("pseen_q12").isNotNull(),
                        F.col("pseen_q12").cast("double") / F.lit(Q12),
                    ).otherwise(
                        (F.col("left_q12").cast("double") / F.col("den_q12").cast("double"))
                        * (F.col("cnt").cast("double") / F.col("t_tok").cast("double"))
                    )
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lp_q6"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp_q6").cast("long").alias("sum_lp_q6"),
    )


def oov_rate(
    df: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unit: str = "token",
) -> DataFrame:
    """Out-of-vocabulary rate per held-out document against the
    training split's vocabulary — the tokenizer/LM coverage metric
    every vocabulary decision is judged by (the <unk>-rate of Chen &
    Goodman's perplexity setups; BPE exists to drive this to zero).
    ``unit="bigram"`` counts unseen adjacent PAIRS instead — the
    back-off rate a Katz/KN bigram model pays on this held-out split.

    Output: (id_col, n_tokens, n_oov, oov_q6) with oov_q6 =
    floor(n_oov / n_tokens * 1e6 + 0.5) — one integer division.
    """
    if unit not in ("token", "bigram"):
        raise ValueError(f"unit must be 'token' or 'bigram', got {unit!r}")

    def _units(frame: DataFrame, with_id: bool) -> DataFrame:
        cols = [id_col] if with_id else []
        if unit == "token":
            return frame.select(
                *cols,
                F.explode(
                    F.array_remove(F.split(F.col(text_col), " "), "")
                ).alias("w"),
            )
        toks = frame.select(
            *cols, F.array_remove(F.split(F.col(text_col), " "), "").alias("t")
        ).filter(F.size("t") >= 2)
        return toks.select(
            *cols,
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> concat(t[i], ' ', w))"
                )
            ).alias("w"),
        )

    vocab = _units(train, with_id=False).distinct().withColumn("_known", F.lit(1))
    toks = _units(df, with_id=True)
    return (
        toks.join(vocab, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_known").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.floor(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("oov_q6"),
        )
    )
