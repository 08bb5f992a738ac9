"""Text-analysis operators: token counting, quality scoring, language ID,
fingerprinting — all built-in-function Column expressions (whole-stage
codegen; zero Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

_STOP_LIST = sorted(ENGLISH_STOP_WORDS)


def _raw_tokens(text_col):
    return F.split(text_col, " ")


def _stop_count(toks_col):
    return F.size(F.filter(toks_col, lambda t: t.isin(*_STOP_LIST)))


def token_counts(docs: DataFrame, index) -> DataFrame:
    """(doc_id, n_tokens, n_terms, n_unique_terms): raw whitespace tokens,
    analyzed emitted terms (stop-filtered), distinct terms."""
    fld = index.default_field
    uniq = (
        index.postings.filter(F.col("field") == fld)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_unique_terms"))
    )
    return (
        docs.select(
            "doc_id", F.size(_raw_tokens(F.col("text"))).cast("long").alias("n_tokens")
        )
        .join(
            index.doclens.filter(F.col("field") == fld).select(
                "doc_id", F.col("dl").cast("long").alias("n_terms")
            ),
            "doc_id",
        )
        .join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_terms",
            F.coalesce("n_unique_terms", F.lit(0)).cast("long").alias("n_unique_terms"),
        )
    )


def quality_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, stop_ratio_q): stopword-density quality signal,
    ratio quantized to floor(r*10000+0.5)."""
    toks = _raw_tokens(F.col("text"))
    n_tokens = F.size(toks).cast("long")
    ratio = _stop_count(toks).cast("double") / n_tokens
    ratio_q = F.floor(ratio * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        docs.select("doc_id", n_tokens.alias("n_tokens"), ratio_q.alias("stop_ratio_q"))
        .filter(F.col("n_tokens") > 0)
    )


def language_id(docs: DataFrame, threshold: float = 0.02) -> DataFrame:
    """(doc_id, lang_pred): English stopword-density heuristic — stands in
    for an n-gram language model; the Spark plumbing (pure Column ops,
    broadcastable model constants) is the part that matters at scale."""
    toks = _raw_tokens(F.col("text"))
    ratio = _stop_count(toks).cast("double") / F.size(toks)
    pred = F.when((F.size(toks) > 0) & (ratio >= threshold), "en").otherwise("unknown")
    return docs.select("doc_id", pred.alias("lang_pred"))


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): md5 content hash (dedup/identity key)."""
    return docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("fingerprint"))


def zipf_vocab_stats(term_stats: DataFrame, quantum: float = 1e6) -> DataFrame:
    """Corpus vocabulary rank–frequency statistics: fit ln(freq) = a +
    slope * ln(rank) by least squares over the whole term dictionary —
    the Zipf diagnostic every corpus-curation pipeline plots (natural
    web text slopes ≈ -1; synthetic/degenerate corpora deviate, so the
    slope is a cheap corpus-health signal alongside the quality rules).

    Determinism contract (gate oracle): ln(rank)/ln(freq) are QUANTIZED
    to bigints first (floor(ln(v)*quantum + 0.5)), the regression sums
    are exact integer aggregates over those bigints, and only the final
    slope/intercept formula runs in double — identical IEEE ops on
    identical integers in both engines, so the result is bit-stable.

    Scale note: the global row_number window sorts only the TERM
    DICTIONARY (vocabulary ≪ corpus; even a 10^12-doc crawl has ~10^8
    distinct terms after analysis), and the downstream aggregate is a
    single map-side-combinable pass; ranks beyond ~2^40 would need the
    sort-based two-pass rank instead of one window partition.

    Input: term_stats (term, ttf) for one field. Output one row:
    (n_terms, total_tokens, slope_q, intercept_q).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("ttf"), F.asc("term"))
    q = term_stats.select("term", F.col("ttf").cast("long").alias("ttf")).withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
    lq = q.select(
        F.floor(F.log(F.col("rank").cast("double")) * F.lit(quantum) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("ttf").cast("double")) * F.lit(quantum) + F.lit(0.5))
        .cast("long")
        .alias("yq"),
        "ttf",
    )
    ag = lq.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.sum("ttf").cast("long").alias("total_tokens"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nd
    return ag.select(
        F.col("n").alias("n_terms"),
        "total_tokens",
        F.floor(slope * F.lit(quantum) + F.lit(0.5)).cast("long").alias("slope_q"),
        F.floor(intercept + F.lit(0.5)).cast("long").alias("intercept_q"),
    )


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 20, quantum: float = 1e6
) -> DataFrame:
    """Collocation extraction by pointwise mutual information over
    adjacent token pairs (Church & Hanks 1990; Manning & Schütze ch. 5)
    — the standard first pass for multiword-expression/vocab induction
    in corpus pipelines:

        pmi(a,b) = ln( (c_ab / B) / ((c_a / T) * (c_b / T)) )

    with c_ab bigram count, B total bigrams, c_a/c_b unigram counts,
    T total tokens; pairs below ``min_count`` are dropped (PMI's
    low-count instability). Raw whitespace tokens (no stop filter) so
    function-word collocations are measurable.

    Spark shape: bigrams come from a pure Column transform over the
    token array (no posexplode self-join); two groupBy counts and two
    broadcast scalars are the whole job. All counts are exact bigints;
    the single ln runs on the same integer inputs in any engine, so
    pmi_q = floor(pmi * quantum + 0.5) is bit-stable.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    td = docs.select(toks.alias("t")).filter(F.size("t") >= 2)
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = td.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    tot = (
        uni.agg(F.sum("c").cast("long").alias("T"))
        .crossJoin(big.agg(F.sum("cb").cast("long").alias("B")))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = (
        big.filter(F.col("cb") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "cb",
            F.floor(
                F.log(
                    (F.col("cb").cast("double") / F.col("B"))
                    / (
                        (F.col("c1").cast("double") / F.col("T"))
                        * (F.col("c2").cast("double") / F.col("T"))
                    )
                )
                * F.lit(quantum)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pmi_q"),
        )
    )
    return pmi.orderBy(F.desc("pmi_q"), F.asc("w1"), F.asc("w2")).limit(k)


def segment_queries(
    docs: DataFrame, query_mod: int = 7, k: int = 25, quantum: float = 1e6
) -> DataFrame:
    """PMI-driven query segmentation (the connexity signal of Risvik et
    al. 2003; Bergsma & Wang EMNLP'07 use the same association-score
    decision): a multi-word query is split where adjacent terms are NOT
    positively associated in the corpus, and kept as a phrase where
    they are — the decision that turns `new york pizza` into
    ["new york", "pizza"] before retrieval, upgrading the middle of the
    query to a PhraseQuery.

    Queries are synthesized deterministically as the first 3 raw tokens
    of every ``query_mod``-th document (so every query bigram exists in
    the corpus by construction).  Boundary rule: keep (w_i, w_i+1)
    joined iff pmi_q(w_i, w_i+1) > 0 (positive association), split
    otherwise; segmentation rendered with '|' at boundaries.

    Same exact-integer-counts / single-quantized-ln contract as
    pmi_collocations; the corpus-wide unigram/bigram tables are two
    groupBy counts shared by every query — at serving scale they are
    precomputed once and broadcast.  Output: (doc_id, query, pmi12_q,
    pmi23_q, segmentation), first k by doc_id.
    """
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    td = docs.select(toks.alias("t")).filter(F.size("t") >= 2)
    pairs = td.select(
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1),"
                " (x, i) -> struct(x AS w1, element_at(t, i + 2) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    tot = (
        uni.agg(F.sum("c").cast("long").alias("T"))
        .crossJoin(big.agg(F.sum("cb").cast("long").alias("B")))
    )

    q = docs.filter((F.col("doc_id") % query_mod == 0) & (F.size(toks) >= 3)).select(
        "doc_id",
        F.element_at(toks, 1).alias("w1"),
        F.element_at(toks, 2).alias("w2"),
        F.element_at(toks, 3).alias("w3"),
    )

    def _pmi_q(cb_col, c1_col, c2_col):
        return F.floor(
            F.log(
                (cb_col.cast("double") / F.col("B"))
                / ((c1_col.cast("double") / F.col("T")) * (c2_col.cast("double") / F.col("T")))
            )
            * F.lit(quantum)
            + F.lit(0.5)
        ).cast("long")

    b12 = big.select(
        F.col("w1"), F.col("w2"), F.col("cb").alias("cb12")
    )
    b23 = big.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("cb").alias("cb23")
    )
    u = lambda name, alias: uni.select(F.col("w").alias(name), F.col("c").alias(alias))
    joined = (
        q.join(b12, ["w1", "w2"])
        .join(b23, ["w2", "w3"])
        .join(u("w1", "c1"), "w1")
        .join(u("w2", "c2"), "w2")
        .join(u("w3", "c3"), "w3")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.concat_ws(" ", "w1", "w2", "w3").alias("query"),
            _pmi_q(F.col("cb12"), F.col("c1"), F.col("c2")).alias("pmi12_q"),
            _pmi_q(F.col("cb23"), F.col("c2"), F.col("c3")).alias("pmi23_q"),
            "w1",
            "w2",
            "w3",
        )
    )
    seg = F.concat(
        F.col("w1"),
        F.when(F.col("pmi12_q") > 0, F.lit(" ")).otherwise(F.lit("|")),
        F.col("w2"),
        F.when(F.col("pmi23_q") > 0, F.lit(" ")).otherwise(F.lit("|")),
        F.col("w3"),
    )
    return (
        joined.select("doc_id", "query", "pmi12_q", "pmi23_q", seg.alias("segmentation"))
        .orderBy(F.asc("doc_id"))
        .limit(k)
    )


def rake_keyphrases(
    docs: DataFrame,
    max_words: int = 4,
    k: int = 20,
    quantum: float = 1e6,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley, "Rapid
    automatic keyword extraction", Text Mining 2010): candidate phrases
    are maximal stopword-free token runs (the analyzer's 33-word
    English stop set as delimiters), scored by summing their words'
    degree/frequency ratios — deg(w) counts co-occurrence inside
    candidate phrases (including w itself), freq(w) the word's phrase
    occurrences.  High-degree words in short phrases win: the classic
    cheap keyphrase pass pipelines run before anything learned.

    Runs longer than ``max_words`` are discarded (RAKE's phrase-length
    filter).  Phrase scoring is over phrase TYPES corpus-wide.  All
    counts are exact integers; word scores quantize deg/freq at
    ``quantum`` and phrase scores are exact integer sums of those —
    engine-order independent.  The run segmentation is one cumulative
    sum over positions; no UDF anywhere.

    Output: (phrase, n_words, n_occurrences, score_q), top k by
    (score_q DESC, phrase ASC).
    """
    from pyspark.sql import Window

    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    ).withColumn(
        "st",
        F.when(
            (F.col("w") == "") | F.array_contains(stops, F.col("w")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    run_w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn("run_id", F.sum("st").over(run_w)).filter(
        F.col("st") == 0
    )
    phrases = (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.concat_ws(
                " ", F.transform(F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"])
            ).alias("phrase"),
            F.count("*").cast("long").alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
    )
    occ = phrases.select("phrase", "n_words", F.explode(F.split("phrase", " ")).alias("w"))
    word_stats = occ.groupBy("w").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    wscore = word_stats.select(
        "w",
        F.floor(
            F.col("deg").cast("double") / F.col("freq").cast("double") * F.lit(quantum)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ws_q"),
    )
    ptype = phrases.groupBy("phrase").agg(
        F.max("n_words").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    pscore = (
        ptype.select("phrase", "n_words", "n_occurrences", F.explode(F.split("phrase", " ")).alias("w"))
        .join(wscore, "w")
        .groupBy("phrase", "n_words", "n_occurrences")
        .agg(F.sum("ws_q").cast("long").alias("score_q"))
    )
    return (
        pscore.orderBy(F.desc("score_q"), F.asc("phrase"))
        .limit(k)
        .select("phrase", "n_words", "n_occurrences", "score_q")
    )


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    k: int = 20,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    PageRank over the word co-occurrence graph — RAKE's graph-based
    sibling, robust where deg/freq ratios are noisy because scores
    propagate through the whole vocabulary graph instead of a single
    phrase neighborhood.

    Graph: unweighted edges between ADJACENT content words (stop words
    and empties removed, adjacency in the filtered sequence — the
    w=2 co-occurrence window of the paper), both directions, self-loop
    repeats dropped.  Words map to dense ids by sorted-vocabulary rank
    so the existing distributed pagerank() loop runs unchanged; ranks
    map back and quantize 1e-7.

    Output: (word, rank_q), top k by (rank_q DESC, word ASC).
    """
    from pyspark.sql import Window

    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.functions.pagerank import pagerank

    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    toks = (
        docs.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w"))
        .filter((F.col("w") != "") & ~F.array_contains(stops, F.col("w")))
        .withColumn(
            "seq",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
        )
    )
    nxt = toks.select(
        "doc_id", (F.col("seq") - 1).alias("seq"), F.col("w").alias("wb")
    )
    adj = (
        toks.join(nxt, ["doc_id", "seq"])
        .filter(F.col("w") != F.col("wb"))
        .select(F.col("w").alias("wa"), "wb")
    )
    und = adj.union(adj.select(F.col("wb").alias("wa"), F.col("wa").alias("wb"))).distinct()
    vocab = und.select(F.col("wa").alias("word")).distinct()
    wid = vocab.withColumn(
        "wid", (F.row_number().over(Window.orderBy("word")) - 1).cast("long")
    )
    e = (
        und.join(wid.withColumnRenamed("word", "wa").withColumnRenamed("wid", "src"), "wa")
        .join(wid.withColumnRenamed("word", "wb").withColumnRenamed("wid", "dst"), "wb")
        .select("src", "dst")
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    edges = e.join(deg, "src").select("src", "dst", "deg")
    nodes = wid.select(F.col("wid").alias("doc_id"))
    pr = pagerank(nodes, edges, damping=damping, iterations=iterations)
    return (
        pr.join(wid, pr["doc_id"] == wid["wid"])
        .select(
            "word",
            F.floor(F.col("pr") * F.lit(1e7) + F.lit(0.5)).cast("long").alias("rank_q"),
        )
        .orderBy(F.desc("rank_q"), F.asc("word"))
        .limit(k)
    )


def heaps_law_fit(
    docs: DataFrame,
    checkpoints: int = 10,
    quantum: float = 1e6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (Heaps, "Information Retrieval:
    Computational and Theoretical Aspects", 1978: V(T) = k·T^β, natural
    text β ≈ 0.4-0.6) — the capacity-planning curve for a term
    dictionary: it says how the vocab (and so the term-dict tier of the
    index) grows as the crawl grows from 10^9 to 10^12 tokens.

    Method: scan documents in doc_id order, record (tokens-so-far,
    distinct-terms-so-far) at ``checkpoints`` evenly spaced document
    ranks, and least-squares fit ln V = ln k + β·ln T over the
    checkpoints, with the zipf_vocab_stats determinism discipline —
    ln values quantized to bigints, integer regression sums, one double
    slope/intercept formula at the end.

    V-so-far needs no distinct-scan per checkpoint: a term contributes
    to V at every rank >= its FIRST document's rank, so V(rank) is the
    running sum of per-document NEW-term counts — two windows total.

    Output one row: (n_checkpoints, total_tokens, vocab, slope_q,
    intercept_q) with slope_q = floor(β·quantum + 0.5).
    """
    from pyspark.sql import Window

    if checkpoints < 2:
        raise ValueError(f"checkpoints must be >= 2, got {checkpoints}")
    toks = docs.select(
        F.col(id_col).alias("d"),
        F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("term"),
    )
    sizes = toks.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("ntok"))
    first = toks.groupBy("term").agg(F.min("d").alias("d"))
    news = first.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("new_terms"))
    rw = Window.orderBy(F.asc("d"))
    cum = (
        sizes.join(news, "d", "left")
        .withColumn("new_terms", F.coalesce(F.col("new_terms"), F.lit(0)))
        .withColumn("rank", F.row_number().over(rw).cast("long"))
        .withColumn(
            "t_cum",
            F.sum("ntok").over(rw.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
        )
        .withColumn(
            "v_cum",
            F.sum("new_terms")
            .over(rw.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    n_docs = cum.agg(F.max("rank").cast("long").alias("nd"))
    bounds = (
        docs.sparkSession.range(1, checkpoints + 1)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(n_docs))
        .select(F.ceil(F.col("nd") * F.col("i") / F.lit(checkpoints)).cast("long").alias("rank"))
        .distinct()
    )
    pts = cum.join(bounds, "rank").select(
        F.floor(F.log(F.col("t_cum").cast("double")) * F.lit(quantum) + F.lit(0.5))
        .cast("long")
        .alias("xq"),
        F.floor(F.log(F.col("v_cum").cast("double")) * F.lit(quantum) + F.lit(0.5))
        .cast("long")
        .alias("yq"),
        "t_cum",
        "v_cum",
        "rank",
    )
    ag = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.max("t_cum").cast("long").alias("total_tokens"),
        F.max("v_cum").cast("long").alias("vocab"),
    )
    nd_ = F.col("n").cast("double")
    num = nd_ * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd_ * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = num / den
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nd_
    return ag.select(
        F.col("n").alias("n_checkpoints"),
        "total_tokens",
        "vocab",
        F.floor(slope * F.lit(quantum) + F.lit(0.5)).cast("long").alias("slope_q"),
        F.floor(intercept + F.lit(0.5)).cast("long").alias("intercept_q"),
    )


def good_turing_counts(
    docs: DataFrame,
    max_r: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Good-Turing frequency-of-frequencies smoothing table (Good,
    "The Population Frequencies of Species and the Estimation of
    Population Parameters", Biometrika 1953; the Gale & Sampson 1995
    presentation): from the term-frequency histogram N_r = |{terms
    with count r}|,

        r*  = (r + 1) · N_{r+1} / N_r       smoothed count for small r
        p0  = N_1 / T                        total unseen-event mass

    — the estimator Katz backoff and (via its marginals) Kneser-Ney
    discounting are built on; the companion of kneser_ney_bigram's
    fixed-D discount.  All counts are exact integers; r* and p0 are
    single divisions quantized q6/q9.

    Events are adjacent-token BIGRAMS (the raw-whitespace convention of
    kneser_ney_bigram_logprob): n-gram models are where the N_r head
    actually has mass — a web-scale unigram table has almost no
    singletons, the bigram/trigram tables are dominated by them, and
    it is exactly those tables Katz/KN smooth.

    Output rows r = 1..max_r:
    (r, n_r, n_r1, r_star_q6, total_tokens, p0_q9).
    """
    if max_r < 1:
        raise ValueError(f"max_r must be >= 1, got {max_r}")
    toks = docs.select(
        F.array_remove(F.split(F.col(text_col), " "), "").alias("t")
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(t, 2, size(t) - 1),"
                " (w, i) -> concat(t[i], ' ', w))"
            )
        ).alias("w")
    )
    freqs = pairs.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("r"))
    nr = freqs.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = freqs.agg(
        F.sum("r").cast("long").alias("total_tokens"),
        F.coalesce(F.sum(F.when(F.col("r") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("n1"),
    )
    base = nr.filter(F.col("r") <= max_r)
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    return (
        base.join(nxt, "r", "left")
        .withColumn("n_r1", F.coalesce(F.col("n_r1"), F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            "n_r1",
            F.floor(
                (F.col("r") + F.lit(1)).cast("double")
                * F.col("n_r1").cast("double")
                / F.col("n_r").cast("double")
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("r_star_q6"),
            "total_tokens",
            F.floor(
                F.col("n1").cast("double") / F.col("total_tokens").cast("double")
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("p0_q9"),
        )
    )


def unigram_entropy(index, field: str | None = None) -> DataFrame:
    """Per-doc unigram (Shannon) entropy of the token distribution —
    the token-diversity quality signal (low entropy = repetitive
    boilerplate/keyword-stuffed pages; the Gopher rules' repetition
    filters are threshold versions of the same quantity).

    Determinism: per (doc, term) the contribution -(c/L)·ln(c/L) is
    quantized to a q9 BIGINT FIRST, then summed — integer addition is
    associative, so the aggregate is hash-stable under any partial-agg
    order (the same discipline as the covering/ERR gates).  Output
    (doc_id, dl, n_distinct, entropy_q9_sum); natural log.
    """
    fld = field or index.default_field
    p = index.postings.filter(F.col("field") == fld).select("doc_id", "tf")
    dl = p.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    j = p.join(dl.select("doc_id", "dl"), "doc_id")
    frac = F.col("tf").cast("double") / F.col("dl").cast("double")
    contrib_q9 = F.floor(-frac * F.log(frac) * F.lit(1e9) + F.lit(0.5)).cast("long")
    per = j.select("doc_id", contrib_q9.alias("c_q9")).groupBy("doc_id").agg(
        F.sum("c_q9").cast("long").alias("entropy_q9_sum")
    )
    return dl.join(per, "doc_id").select("doc_id", "dl", "n_distinct", "entropy_q9_sum")


def term_burstiness(index, min_df: int = 5, field: str | None = None) -> DataFrame:
    """Church–Gale burstiness per term: B = ttf / df, the expected
    within-document frequency given the term occurs at all (Church &
    Gale, "Poisson mixtures", Natural Language Engineering 1995).
    Content words are bursty (B >> 1 relative to their rate); function
    words are Poisson-like.  Output per term with df >= min_df:
    (term, df, ttf, burst_q6) with burst_q6 = floor(ttf/df·1e6 + 0.5)
    — a single IEEE division, bit-stable in any engine.
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    fld = field or index.default_field
    ts = index.term_stats.filter((F.col("field") == fld) & (F.col("df") >= min_df))
    burst = F.col("ttf").cast("double") / F.col("df").cast("double")
    return ts.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("ttf").cast("long").alias("ttf"),
        F.floor(burst * F.lit(1e6) + F.lit(0.5)).cast("long").alias("burst_q6"),
    )


def significant_terms_g2(
    index, seed_term: str, k: int = 15, min_fg_df: int = 2,
    field: str | None = None,
) -> DataFrame:
    """Significant co-occurring terms by Dunning's log-likelihood ratio
    (Dunning, "Accurate methods for the statistics of surprise and
    coincidence", Computational Linguistics 1993) — the statistically
    grounded version of "interesting terms": which terms appear in the
    seed term's documents far more than chance predicts.

    Foreground = docs containing ``seed_term``.  Per candidate term the
    2x2 doc-count contingency table (k11 fg-with, k12 fg-without, k21
    bg-with, k22 bg-without) is built from exact integers, and

        G2 = 2 * [ c(k11) + c(k12) + c(k21) + c(k22) ],
        c(k) = k * ln( k*N / (rowsum*colsum) ),  c(0) = 0

    is ONE fixed left-associated expression per row — no double
    aggregation anywhere, so the q6-quantized score is engine-stable.
    Output top-k by (g2_q6 DESC, term ASC), seed term excluded,
    candidates need k11 >= min_fg_df.
    """
    if min_fg_df < 1 or k < 1:
        raise ValueError("k and min_fg_df must be >= 1")
    fld = field or index.default_field
    n = index.max_doc
    p = index.postings.filter(F.col("field") == fld)
    fg_docs = p.filter(F.col("term") == seed_term).select("doc_id")
    n_fg = fg_docs.count()
    if n_fg == 0:
        raise ValueError(f"seed term {seed_term!r} matches no documents")
    k11 = (
        p.join(fg_docs, "doc_id", "left_semi")
        .filter(F.col("term") != seed_term)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("k11"))
        .filter(F.col("k11") >= min_fg_df)
    )
    stats = index.term_stats.filter(F.col("field") == fld).select(
        "term", F.col("df").cast("long").alias("df")
    )
    t = k11.join(stats, "term").select(
        "term",
        "k11",
        (F.col("df") - F.col("k11")).cast("long").alias("k21"),
        (F.lit(n_fg) - F.col("k11")).cast("long").alias("k12"),
        (F.lit(int(n)) - F.col("df") - F.lit(n_fg) + F.col("k11")).cast("long").alias("k22"),
        "df",
    )
    nn = float(n)

    def _cell(kc, row, col):
        kd = kc.cast("double")
        return F.when(
            kc > 0,
            kd * F.log(kd * F.lit(nn) / (row.cast("double") * col.cast("double"))),
        ).otherwise(F.lit(0.0))

    fgr = F.lit(n_fg)           # row sum for k11/k12
    bgr = F.lit(int(n) - n_fg)  # row sum for k21/k22
    with_c = F.col("df")        # col sum for k11/k21
    wo_c = F.lit(int(n)) - F.col("df")
    g2 = F.lit(2.0) * (
        (
            (_cell(F.col("k11"), fgr, with_c) + _cell(F.col("k12"), fgr, wo_c))
            + _cell(F.col("k21"), bgr, with_c)
        )
        + _cell(F.col("k22"), bgr, wo_c)
    )
    return (
        t.select(
            "term", "k11", "df",
            F.floor(g2 * F.lit(1e6) + F.lit(0.5)).cast("long").alias("g2_q6"),
        )
        .orderBy(F.desc("g2_q6"), F.asc("term"))
        .limit(k)
    )


def vocab_coverage_curve(index, vocab_sizes=(100, 500, 1000, 2000),
                         field: str | None = None) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer/vocab-size planning
    table: for each candidate vocabulary size V, what fraction of the
    corpus token mass do the top-V terms (by collection frequency)
    cover?  The complement is the <unk>/byte-fallback rate a V-entry
    vocabulary would pay.  One window cumsum over the ttf-sorted
    dictionary, all exact integers: (vocab_size, n_terms_total,
    covered_tokens, total_tokens).
    """
    sizes = sorted(set(int(v) for v in vocab_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError("vocab_sizes must be positive")
    fld = field or index.default_field
    ts = index.term_stats.filter(F.col("field") == fld).select("term", "ttf")
    w = Window.orderBy(F.desc("ttf"), F.asc("term"))
    ranked = ts.withColumn("rnk", F.row_number().over(w)).withColumn(
        "cum", F.sum("ttf").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = ts.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_total"),
        F.sum("ttf").cast("long").alias("total_tokens"),
    )
    vs = index.postings.sparkSession.createDataFrame(
        [(v,) for v in sizes], "vocab_size long"
    )
    # coverage at V = cum at rank min(V, n_terms)
    best = (
        vs.crossJoin(F.broadcast(tot))
        .join(
            ranked.select("rnk", F.col("cum").alias("covered_tokens")),
            F.col("rnk") == F.least(F.col("vocab_size"), F.col("n_terms_total")),
        )
        .select("vocab_size", "n_terms_total",
                F.col("covered_tokens").cast("long").alias("covered_tokens"),
                "total_tokens")
    )
    return best


def stopword_induction(index, df_ratio_threshold: float = 0.5,
                       field: str | None = None) -> DataFrame:
    """Automatic stopword identification by document-frequency ratio
    (Wilbur & Sirotkin, "The automatic identification of stop words",
    J. Info. Sci. 1992 frame the statistical version; the df/N
    threshold is the standard first cut every IR stack applies):
    terms appearing in more than ``df_ratio_threshold`` of all
    documents carry little discrimination and are stoplist candidates.

    Exact integer predicate (df * 2 > N for the 0.5 default —
    cross-multiplied so no float compare) and exact mass accounting:
    (term, df, ttf, pct_docs_q4) sorted most-common-first.
    """
    if not 0.0 < df_ratio_threshold < 1.0:
        raise ValueError("df_ratio_threshold must be in (0, 1)")
    fld = field or index.default_field
    n = int(index.max_doc)
    # cross-multiplied integer threshold: df / N > r  <=>  df * DEN > r*DEN * N
    # with r expressed exactly in 1e6ths
    r_ppm = int(round(df_ratio_threshold * 1_000_000))
    ts = index.term_stats.filter(F.col("field") == fld)
    out = ts.filter(F.col("df") * F.lit(1_000_000) > F.lit(r_ppm) * F.lit(n)).select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("ttf").cast("long").alias("ttf"),
        F.floor(F.col("df").cast("double") / F.lit(float(n)) * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("pct_docs_q4"),
    )
    return out.orderBy(F.desc("df"), F.asc("term"))


def readability_scores(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Flesch Reading Ease and Flesch-Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975) — the classic readability quality signals a
    curation pipeline buckets documents by.

    Deterministic sub-measures, all exact integers:
      * n_sentences = max(1, count of [.!?] runs) — unpunctuated web
        fragments count as one sentence;
      * n_words     = whitespace tokens;
      * n_syllables = per word max(1, count of [aeiouy]+ vowel-group
        runs) — the standard dictionary-free syllable heuristic.

    The two scores are each ONE double expression over those integers
    (IEEE-reproducible in any engine), quantized q4:
      FRE  = 206.835 - 1.015*(W/S) - 84.6*(SYL/W)
      FKGL = 0.39*(W/S) + 11.8*(SYL/W) - 15.59
    """
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0))),
    )
    n_w = F.size(toks).cast("long")
    n_s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
    ).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        n_w.alias("n_words"),
        n_s.alias("n_sentences"),
        syl.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.floor((F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
                * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("fre_q4"),
        F.floor((F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
                * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("fkgl_q4"),
    )


def vocab_richness(
    docs: DataFrame, text_col: str = "text", ngram: int = 1
) -> DataFrame:
    """Nonparametric vocabulary-richness estimators over the unigram
    frequency histogram — "how much vocabulary haven't we crawled yet":

    * Chao1 (Chao, Scand. J. Statist. 1984): V + f1^2 / (2 f2), the
      abundance-based lower bound on true vocabulary size (f1 = hapax
      legomena, f2 = dis legomena; bias-corrected f1(f1-1)/2 form when
      f2 = 0).
    * First-order jackknife (Burnham & Overton 1978): V + f1.
    * Simpson concentration (Simpson, Nature 1949):
      sum n_i(n_i - 1) / (N(N - 1)) — repeat-probability of two drawn
      tokens being the same type (diversity = 1 - concentration).

    Every moment (V, f1, f2, N, sum n(n-1)) is an exact integer; each
    estimator closes in ONE double expression.  Output one row:
    (v_obs, f1, f2, n_tokens, chao1_q2, jack1, simpson_q9).

    ``ngram=2`` counts adjacent-token bigram events instead (the
    good_turing_counts convention) — on a closed small vocabulary the
    unigram histogram has no hapax mass and every estimator collapses
    to V; the bigram table is where the rare head lives.
    """
    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")
    if ngram == 1:
        toks = docs.select(
            F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
        )
    else:
        arr = docs.select(
            F.array_remove(F.split(F.col(text_col), " "), "").alias("t")
        ).filter(F.size("t") >= 2)
        toks = arr.select(
            F.explode(
                F.expr(
                    "transform(slice(t, 2, size(t) - 1),"
                    " (w, i) -> concat(t[i], ' ', w))"
                )
            ).alias("w")
        )
    freqs = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = freqs.agg(
        F.count("*").cast("long").alias("v_obs"),
        F.coalesce(F.sum(F.when(F.col("n") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("f1"),
        F.coalesce(F.sum(F.when(F.col("n") == 2, 1)), F.lit(0))
        .cast("long")
        .alias("f2"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.col("n") * (F.col("n") - F.lit(1))).cast("long").alias("rep2"),
    )
    chao = F.when(
        F.col("f2") > 0,
        F.col("v_obs").cast("double")
        + F.col("f1").cast("double")
        * F.col("f1").cast("double")
        / (F.lit(2.0) * F.col("f2").cast("double")),
    ).otherwise(
        F.col("v_obs").cast("double")
        + F.col("f1").cast("double") * (F.col("f1") - F.lit(1)).cast("double")
        / F.lit(2.0)
    )
    simpson = F.when(
        F.col("n_tokens") > 1,
        F.floor(
            F.col("rep2").cast("double")
            / (F.col("n_tokens") * (F.col("n_tokens") - F.lit(1))).cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return m.select(
        "v_obs",
        "f1",
        "f2",
        "n_tokens",
        F.floor(chao * F.lit(100.0) + F.lit(0.5)).cast("long").alias("chao1_q2"),
        (F.col("v_obs") + F.col("f1")).cast("long").alias("jack1"),
        simpson.alias("simpson_q9"),
    )
