"""Suggest / spell module — the common 80% of src/Lucene.Net.Suggest
(~10k LoC) re-expressed over term-sorted tables:

- prefix_suggest: raw-term autocomplete — a prefix scan of the term-stats
  table + top-n by weight (ttf), parquet min/max pruning doing the FST
  seek's job.
- AnalyzingSuggester (Suggest/Analyzing/AnalyzingSuggester.cs): the
  (analyzed-form -> surface, weight) FST becomes an analyzed-key table;
  lookup analyzes the key with the query analyzer and runs an
  analyzed-prefix scan, exact analyzed matches first (EXACT_FIRST),
  token boundaries preserved via a separator byte (PRESERVE_SEP).
- spell_suggest: DirectSpellChecker (Spell/DirectSpellChecker.cs) — the
  candidate enumeration is a pushdown dictionary scan with a length
  window + Damerau distance (DirectSpellChecker uses the transposing
  fuzzy automaton, INTERNAL_LEVENSHTEIN comparator), ranked by
  (distance ASC, docFreq DESC, term ASC); a word present in the
  dictionary with df >= max_query_frequency yields no suggestions.
- word_breaks / word_combinations: WordBreakSpellChecker
  (Spell/WordBreakSpellChecker.cs) with the default maxChanges=1 —
  one break (two dictionary words) / one adjacent-pair combination,
  both halves required to clear minSuggestionFrequency, ranked
  changes-then-max-frequency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex

# PRESERVE_SEP token separator (the reference uses SEP_LABEL=0x1F inside
# the FST byte stream, AnalyzingSuggester.cs)
SEP = "\x1f"


def prefix_suggest(
    index: InvertedIndex, prefix: str, n: int = 5, field: str | None = None
) -> DataFrame:
    """Top-n completions of `prefix` by collection frequency:
    (term, weight) ordered weight DESC, term ASC."""
    fld = field or index.default_field
    return (
        index.term_stats.filter(
            (F.col("field") == fld) & F.col("term").startswith(prefix)
        )
        .select("term", F.col("ttf").cast("long").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(n)
    )


def spell_suggest(
    index: InvertedIndex,
    word: str,
    n: int = 5,
    max_edits: int = 2,
    field: str | None = None,
    min_doc_freq: int = 1,
    distance: str = "osa",
) -> DataFrame:
    """Correction candidates for `word`: dictionary terms within
    `max_edits` Damerau edits (excluding the word itself) —
    DirectSpellChecker.SuggestSimilar. Candidate GENERATION is always the
    edit-bounded scan (the reference's FuzzyTermsEnum stage); `distance`
    picks the IStringDistance used for RANKING
    (DirectSpellChecker.Distance):

    - "osa" (default): rank (dist ASC, df DESC, term ASC) — the
      LuceneLevenshteinDistance ordering.
    - "jaro_winkler": rank by JaroWinklerDistance score
      (Spell/JaroWinklerDistance.cs) quantized to 1e-4
      (sim_q DESC, df DESC, term ASC); output column `sim_q`.
    - "ngram": rank by NGramDistance(2) similarity
      (Spell/NGramDistance.cs, Kondrak 2005), same output shape.

    The distance runs driver-free: a pushdown scan of the term dictionary
    with a length-window prefilter, then the exact distance via a
    vectorized pandas stage over the (small) surviving candidate set.
    """
    import pandas as pd
    from pyspark.sql import types as T

    fld = field or index.default_field
    cand = index.term_stats.filter(
        (F.col("field") == fld)
        & (F.col("term") != word)
        & (F.length("term") >= len(word) - max_edits)
        & (F.length("term") <= len(word) + max_edits)
        & (F.levenshtein(F.col("term"), F.lit(word)) <= 2 * max_edits)
        & (F.col("df") >= min_doc_freq)
    ).select("term", F.col("df").cast("long").alias("df"))

    out_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("df", T.LongType(), False),
            T.StructField("dist", T.IntegerType(), False),
        ]
    )

    def add_dist(batches):
        from lucenenet_spark.search.searcher import _osa_distance

        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf["dist"] = [ _osa_distance(t, word) for t in pdf["term"] ]
            else:
                pdf = pd.DataFrame({"term": [], "df": [], "dist": []})
            yield pdf[["term", "df", "dist"]]

    scored = cand.mapInPandas(add_dist, out_schema).filter(F.col("dist") <= max_edits)
    if distance == "osa":
        return scored.orderBy(F.asc("dist"), F.desc("df"), F.asc("term")).limit(n)
    if distance not in ("jaro_winkler", "ngram"):
        raise ValueError(f"unknown distance {distance!r}")

    sim_schema = T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("df", T.LongType(), False),
            T.StructField("sim_q", T.LongType(), False),
        ]
    )

    def add_sim(batches):
        from lucenenet_spark.search.distances import jaro_winkler, ngram_distance

        fn = jaro_winkler if distance == "jaro_winkler" else ngram_distance
        for pdf in batches:
            if len(pdf):
                pdf = pdf.copy()
                pdf["sim_q"] = [
                    int(fn(t, word) * 10000 + 0.5) for t in pdf["term"]
                ]
            else:
                pdf = pd.DataFrame({"term": [], "df": [], "sim_q": []})
            yield pdf[["term", "df", "sim_q"]]

    ranked = scored.drop("dist").mapInPandas(add_sim, sim_schema)
    return ranked.orderBy(F.desc("sim_q"), F.desc("df"), F.asc("term")).limit(n)


class AnalyzingSuggester:
    """Analyzed-form completion with weights
    (Suggest/Analyzing/AnalyzingSuggester.cs).

    Build: entries (surface, weight) -> table (analyzed, surface, weight),
    where analyzed = query/index analyzer's token stream joined by SEP
    (PRESERVE_SEP) or concatenated (preserve_sep=False). The reference
    compiles this into an FST keyed by analyzed bytes with (weight,
    surface) outputs; a sorted columnar table + prefix predicate is the
    same search structure for Spark (min/max pruning = FST seek).

    Lookup: analyze the key, scan analyzed-prefix completions, rank
    weight DESC (the FST's topN path search), surface ASC tie-break;
    exact analyzed matches first when exact_first (EXACT_FIRST option,
    AnalyzingSuggester.cs DoLookup's exactFirst branch).
    """

    def __init__(self, entries: DataFrame, analyzer=None,
                 preserve_sep: bool = True, exact_first: bool = True,
                 surface_col: str = "surface", weight_col: str = "weight"):
        import pandas as pd
        from pyspark.sql import types as T

        from lucenenet_spark.analysis.analyzers import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.preserve_sep = preserve_sep
        self.exact_first = exact_first
        az = self.analyzer
        sep = SEP if preserve_sep else ""

        schema = T.StructType(
            [
                T.StructField("analyzed", T.StringType(), False),
                T.StructField("surface", T.StringType(), False),
                T.StructField("weight", T.LongType(), False),
            ]
        )

        def run(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "analyzed": [sep.join(az.terms(s)) for s in pdf["surface"]],
                        "surface": pdf["surface"],
                        "weight": pdf["weight"].astype("int64"),
                    }
                )

        src = entries.select(
            F.col(surface_col).alias("surface"), F.col(weight_col).alias("weight")
        )
        self.table = src.mapInPandas(run, schema)

    def cache(self) -> "AnalyzingSuggester":
        self.table = self.table.cache()
        return self

    def lookup(self, key: str, n: int = 5) -> DataFrame:
        """Top-n (surface, weight) completions of the analyzed key."""
        sep = SEP if self.preserve_sep else ""
        akey = sep.join(self.analyzer.terms(key))
        out = self.table.filter(F.col("analyzed").startswith(akey))
        order = [F.desc("weight"), F.asc("surface")]
        if self.exact_first:
            order = [F.desc((F.col("analyzed") == akey).cast("int"))] + order
        return out.select("surface", "weight").orderBy(*order).limit(n)


def word_breaks(
    index: InvertedIndex,
    word: str,
    n: int = 5,
    min_break_length: int = 1,
    min_freq: int = 1,
    field: str | None = None,
) -> DataFrame:
    """WordBreakSpellChecker.SuggestWordBreaks with the default
    maxChanges=1: split `word` at every position where BOTH halves are
    dictionary terms with df >= minSuggestionFrequency; rank
    NUM_CHANGES_THEN_MAX_FREQUENCY (all candidates here have one change,
    so max-half-frequency DESC, left ASC). Returns
    (left_w, right_w, freq_max)."""
    fld = field or index.default_field
    spark = index.term_stats.sparkSession
    splits = [
        (word[:i], word[i:])
        for i in range(min_break_length, len(word) - min_break_length + 1)
    ]
    if not splits:
        return spark.createDataFrame([], "left_w string, right_w string, freq_max long")
    pairs = spark.createDataFrame(splits, "left_w string, right_w string")
    ts = index.term_stats.filter(F.col("field") == fld).select("term", "df")
    halves = sorted({w for s in splits for w in s})
    ts = ts.filter(F.col("term").isin(halves))  # pushdown: only split halves
    out = (
        pairs.join(ts.select(F.col("term").alias("left_w"), F.col("df").alias("_dfl")), "left_w")
        .join(ts.select(F.col("term").alias("right_w"), F.col("df").alias("_dfr")), "right_w")
        .filter((F.col("_dfl") >= min_freq) & (F.col("_dfr") >= min_freq))
        .select(
            "left_w",
            "right_w",
            F.greatest("_dfl", "_dfr").cast("long").alias("freq_max"),
        )
    )
    return out.orderBy(F.desc("freq_max"), F.asc("left_w")).limit(n)


def word_combinations(
    index: InvertedIndex,
    terms: list[str],
    n: int = 5,
    min_freq: int = 1,
    max_combine_length: int = 20,
    field: str | None = None,
) -> DataFrame:
    """WordBreakSpellChecker.SuggestWordCombinations, maxChanges=1:
    concatenate each ADJACENT pair of query terms and keep combinations
    that are dictionary terms with df >= minSuggestionFrequency, ranked
    frequency DESC (combined ASC tie-break). Returns (combined, freq)."""
    fld = field or index.default_field
    spark = index.term_stats.sparkSession
    combos = sorted(
        {
            terms[i] + terms[i + 1]
            for i in range(len(terms) - 1)
            if len(terms[i] + terms[i + 1]) <= max_combine_length
        }
    )
    if not combos:
        return spark.createDataFrame([], "combined string, freq long")
    ts = index.term_stats.filter(
        (F.col("field") == fld) & F.col("term").isin(combos) & (F.col("df") >= min_freq)
    )
    return (
        ts.select(F.col("term").alias("combined"), F.col("df").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("combined"))
        .limit(n)
    )


class AnalyzingInfixSuggester(AnalyzingSuggester):
    """AnalyzingInfixSuggester (Suggest/Analyzing/AnalyzingInfixSuggester
    .cs): the key's analyzed tokens match ANYWHERE in the suggestion —
    all but the last as exact token matches, the last as a token-prefix
    match (the reference indexes suggestion tokens + edge-grams of the
    last-token prefix; here the analyzed-token array + an exists()
    predicate is the same search). Ranked weight DESC like the reference's
    LongField sort.

    Contexts (AnalyzingInfixSuggester.cs Lookup(key, contexts, ...)):
    pass ``contexts_df`` — long-format (surface, context) rows — at
    construction, then ``lookup(..., contexts={...})`` keeps only
    suggestions carrying at least one of the given contexts (the
    reference's CONTEXTS_FIELD disjunction), via one left-semi join."""

    def __init__(self, entries: DataFrame, *, contexts_df: DataFrame | None = None, **kw):
        super().__init__(entries, **kw)
        self.contexts_df = contexts_df

    def lookup(self, key: str, n: int = 5, contexts=None) -> DataFrame:
        toks = self.analyzer.terms(key)
        if not toks:
            return self.table.select("surface", "weight").limit(0)
        arr = F.split(F.col("analyzed"), SEP)
        cond = F.exists(arr, lambda x: x.startswith(toks[-1]))
        for t in toks[:-1]:
            cond = cond & F.array_contains(arr, t)
        out = self.table.filter(cond)
        if contexts is not None:
            if self.contexts_df is None:
                raise ValueError("contexts given but no contexts_df was provided")
            ok = (
                self.contexts_df.filter(F.col("context").isin(sorted(contexts)))
                .select("surface")
                .distinct()
            )
            out = out.join(ok, "surface", "left_semi")
        return (
            out.select("surface", "weight")
            .orderBy(F.desc("weight"), F.asc("surface"))
            .limit(n)
        )


class FuzzySuggester(AnalyzingSuggester):
    """FuzzySuggester (Suggest/Analyzing/FuzzySuggester.cs) subset: a
    completion matches when the analyzed form's prefix of the key's
    length is within max_edits Damerau/OSA edits of the analyzed key
    (transpositions=true, the reference default), subject to
    non_fuzzy_prefix exact leading characters and min_fuzzy_length
    (shorter keys fall back to exact prefix). Ranking is unchanged:
    weight DESC, surface ASC."""

    def __init__(self, entries: DataFrame, max_edits: int = 1,
                 non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3, **kw):
        super().__init__(entries, **kw)
        self.max_edits = max_edits
        self.non_fuzzy_prefix = non_fuzzy_prefix
        self.min_fuzzy_length = min_fuzzy_length

    def lookup(self, key: str, n: int = 5) -> DataFrame:
        import pandas as pd
        from pyspark.sql import types as T

        sep = SEP if self.preserve_sep else ""
        akey = sep.join(self.analyzer.terms(key))
        if len(akey) < self.min_fuzzy_length:
            return super().lookup(key, n)
        # pushdown prune: exact non-fuzzy prefix + edit-window on length
        pre = akey[: self.non_fuzzy_prefix]
        cand = self.table.filter(
            F.col("analyzed").startswith(pre)
            & (F.length("analyzed") >= len(akey) - self.max_edits)
        )
        k, me = akey, self.max_edits

        schema = T.StructType(
            [
                T.StructField("surface", T.StringType(), False),
                T.StructField("weight", T.LongType(), False),
                T.StructField("dist", T.IntegerType(), False),
            ]
        )

        def run(batches):
            from lucenenet_spark.search.searcher import _osa_distance

            for pdf in batches:
                d = [
                    _osa_distance(a[: len(k)], k) for a in pdf["analyzed"]
                ]
                out = pd.DataFrame(
                    {"surface": pdf["surface"], "weight": pdf["weight"], "dist": d}
                )
                yield out[out["dist"] <= me]

        got = cand.mapInPandas(run, schema)
        return (
            got.select("surface", "weight")
            .orderBy(F.desc("weight"), F.asc("surface"))
            .limit(n)
        )


class FreeTextSuggester:
    """FreeTextSuggester (Suggest/Analyzing/FreeTextSuggester.cs) subset:
    an n-gram language model over the corpus token stream with stupid
    backoff (ALPHA=0.4, :66-72 — "Stupid Backoff: Inexpensive Queries...",
    Brants et al. EMNLP 2007). ngrams=2 here: lookup(context_word,
    last-token prefix) scores completion candidates
        score = count(context, w) / count(context)            (bigram hit)
              = 0.4 * count(w) / total_tokens                  (backoff)
    over analyzed tokens, ranked score DESC, token ASC. The model tables
    are one groupBy each — the FST byte arcs become count tables."""

    ALPHA = 0.4

    def __init__(self, docs: DataFrame, analyzer=None, text_col: str = "text"):
        from lucenenet_spark.analysis.analyzers import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        az = self.analyzer
        import pandas as pd
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("w1", T.StringType(), True),
                T.StructField("w2", T.StringType(), False),
            ]
        )

        def run(batches):
            for pdf in batches:
                a, b = [], []
                for text in pdf[text_col]:
                    toks = az.terms(text)
                    for i, t in enumerate(toks):
                        a.append(toks[i - 1] if i > 0 else None)
                        b.append(t)
                yield pd.DataFrame({"w1": a, "w2": b})

        grams = docs.select(text_col).mapInPandas(run, schema)
        self.bigrams = grams.filter(F.col("w1").isNotNull()).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c2")
        )
        self.unigrams = grams.groupBy("w2").agg(F.count(F.lit(1)).alias("c1"))
        self.total = None  # lazy

    def cache(self) -> "FreeTextSuggester":
        self.bigrams = self.bigrams.cache()
        self.unigrams = self.unigrams.cache()
        return self

    def lookup(self, context: str, prefix: str, n: int = 5) -> DataFrame:
        """(token, score_q) completions of `prefix` given one context
        word; score_q = floor(score * 10^7 + 0.5)."""
        if self.total is None:
            self.total = self.unigrams.agg(F.sum("c1")).collect()[0][0]
        ctx = self.analyzer.terms(context)
        cw = ctx[-1] if ctx else None
        uni = self.unigrams.filter(F.col("w2").startswith(prefix))
        cc = None
        if cw is not None:
            row = self.unigrams.filter(F.col("w2") == F.lit(cw)).select("c1").collect()
            cc = int(row[0][0]) if row else None
        backoff = (
            F.lit(self.ALPHA) * F.col("c1").cast("double") / F.lit(float(self.total))
        )
        if cc is None:
            # Empty/unanalyzable context, or a context word never seen in
            # the corpus: the bigram numerator is 0 for every candidate, so
            # stupid backoff degenerates to the ALPHA-scaled unigram
            # ranking. (Joining against the empty ctx-count frame would
            # instead return ZERO suggestions — the w1 == NULL comparison
            # matches nothing and the count crossJoin empties the plan.)
            joined = uni
            score = backoff
        else:
            bi = self.bigrams.filter(
                (F.col("w1") == F.lit(cw)) & F.col("w2").startswith(prefix)
            )
            joined = uni.join(bi.select("w2", "c2"), "w2", "left")
            score = F.when(
                F.col("c2").isNotNull(),
                F.col("c2").cast("double") / F.lit(float(cc)),
            ).otherwise(backoff)
        return (
            joined.select(
                F.col("w2").alias("token"),
                F.floor(score * F.lit(1e7) + F.lit(0.5)).cast("long").alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.asc("token"))
            .limit(n)
        )


class BlendedInfixSuggester(AnalyzingInfixSuggester):
    """BlendedInfixSuggester (Suggest/Analyzing/BlendedInfixSuggester.cs):
    infix lookup whose weights are blended by the matched token's
    POSITION — suggestions matching earlier rank higher at equal weight.

    blender="linear": coefficient = 1 - 0.10 * position (the reference's
    BlenderType.POSITION_LINEAR); "reciprocal": 1 / (position + 1).
    score = floor(weight * coefficient) (the reference's (long) cast;
    identical for the non-negative weights used here), ranked
    score DESC, weight DESC, surface ASC. Position is the matched
    token's index in the emitted (stop-compacted) token list — a
    documented deviation from the reference, which counts pre-filter
    positions including stopword holes.
    """

    def __init__(self, entries: DataFrame, blender: str = "linear", **kw):
        if blender not in ("linear", "reciprocal"):
            raise ValueError(f"unknown blender {blender!r}")
        super().__init__(entries, **kw)
        self.blender = blender

    def lookup(self, key: str, n: int = 5) -> DataFrame:
        toks = self.analyzer.terms(key)
        if not toks:
            return self.table.select("surface", "weight").limit(0)
        arr = F.split(F.col("analyzed"), SEP)

        def first_idx(pred):
            # transform's 2nd lambda arg is the element INDEX (0-based);
            # array_min skips the NULLs of non-matching slots
            return F.array_min(
                F.transform(
                    arr,
                    lambda x, i: F.when(pred(x), i).otherwise(
                        F.lit(None).cast("int")
                    ),
                )
            )

        idxs = [first_idx(lambda x, t=t: x == t) for t in toks[:-1]]
        idxs.append(first_idx(lambda x: x.startswith(toks[-1])))
        cond = idxs[0].isNotNull()
        for c in idxs[1:]:
            cond = cond & c.isNotNull()
        minpos = F.least(*idxs) if len(idxs) > 1 else idxs[0]
        if self.blender == "linear":
            coef = F.lit(1.0) - F.lit(0.10) * minpos
        else:
            coef = F.lit(1.0) / (minpos + F.lit(1.0))
        score = F.floor(F.col("weight") * coef).cast("long")
        return (
            self.table.filter(cond)
            .select("surface", "weight", score.alias("score"))
            .orderBy(F.desc("score"), F.desc("weight"), F.asc("surface"))
            .limit(n)
        )


def document_dictionary(
    docs: DataFrame,
    field: str,
    weight_field: str | None = None,
    payload_field: str | None = None,
) -> DataFrame:
    """DocumentDictionary (Suggest/DocumentDictionary.cs:40-120): one
    suggestion entry per stored document — surface from ``field``,
    weight from the numeric ``weight_field`` (1 when absent, like the
    reference's missing-docvalue branch), optional payload column.
    Null/empty surfaces are skipped (the reference's InputIterator skips
    docs without the field)."""
    w = (
        F.col(weight_field).cast("long")
        if weight_field is not None
        else F.lit(1).cast("long")
    )
    cols = [F.col(field).alias("surface"), F.coalesce(w, F.lit(0)).alias("weight")]
    if payload_field is not None:
        cols.append(F.col(payload_field).alias("payload"))
    return docs.select(*cols).filter(
        F.col("surface").isNotNull() & (F.col("surface") != "")
    )


def file_dictionary(
    spark, path: str, delimiter: str = "\t"
) -> DataFrame:
    """FileDictionary (Suggest/FileDictionary.cs:32-130): each line is
    ``surface[<delim>weight[<delim>payload]]``; a missing or unparsable
    weight defaults to 1 (the reference's format tolerates weightless
    lines). Read as a native text source — parsing happens in codegen."""
    import re as _re

    d = _re.escape(delimiter)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), d)
    return lines.select(
        parts.getItem(0).alias("surface"),
        F.coalesce(
            F.try_element_at(parts, F.lit(2)).try_cast("long"), F.lit(1).cast("long")
        ).alias("weight"),
        F.try_element_at(parts, F.lit(3)).alias("payload"),
    ).filter(F.col("surface") != "")


def mpc_prefix_ranks(
    index, n_targets: int = 20, max_prefix: int = 4, field: str | None = None
) -> DataFrame:
    """Most-Popular-Completion evaluation ranks (the MRR-over-prefixes
    methodology of Bar-Yossef & Kraus, "Context-sensitive query
    auto-completion", WWW 2011 §6: replay each target query one
    keystroke at a time and record where MPC ranks it).

    The term dictionary plays the query log: the ``n_targets`` most
    frequent terms (df DESC, term ASC) are the true queries, popularity
    is df.  For each target t and prefix length L in 1..max_prefix
    (capped at len(t)): candidates = terms sharing substr(t, 1, L),
    rank of t = 1 + |{c : df_c > df_t or (df_c = df_t and c < t)}| —
    a counting aggregate, no window, all integers.  Output one row per
    (term, prefix_len): (term, df, prefix_len, n_candidates, rank).

    Scale shape: targets are a driver-bounded n_targets-row broadcast;
    the dictionary is scanned once per prefix length with an equi-join
    on the computed prefix column.
    """
    if n_targets < 1 or max_prefix < 1:
        raise ValueError("n_targets and max_prefix must be >= 1")
    fld = field or index.default_field
    ts = index.term_stats.filter(F.col("field") == fld).select("term", "df")
    targets = ts.orderBy(F.desc("df"), F.asc("term")).limit(n_targets)
    lens = index.postings.sparkSession.range(1, max_prefix + 1).select(
        F.col("id").cast("int").alias("prefix_len")
    )
    tl = (
        targets.crossJoin(F.broadcast(lens))
        .filter(F.length("term") >= F.col("prefix_len"))
        .select(
            F.col("term").alias("t"), F.col("df").alias("t_df"), "prefix_len",
            F.col("term").substr(F.lit(1), F.col("prefix_len")).alias("_px"),
        )
    )
    cand = ts.select("term", "df")
    j = F.broadcast(tl).join(
        cand, F.col("term").substr(F.lit(1), F.col("prefix_len")) == F.col("_px")
    )
    better = F.when(
        (F.col("df") > F.col("t_df"))
        | ((F.col("df") == F.col("t_df")) & (F.col("term") < F.col("t"))),
        1,
    ).otherwise(0)
    return (
        j.groupBy("t", "t_df", "prefix_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            (F.sum(better) + F.lit(1)).cast("long").alias("rank"),
        )
        .select(
            F.col("t").alias("term"), F.col("t_df").cast("long").alias("df"),
            F.col("prefix_len").cast("long").alias("prefix_len"),
            "n_candidates", "rank",
        )
    )
