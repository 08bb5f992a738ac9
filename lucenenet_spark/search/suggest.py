"""Suggest / spell module — the common 80% of src/Lucene.Net.Suggest
(~10k LoC) re-expressed over the term-stats table:

- prefix_suggest: AnalyzingSuggester/autocomplete shape
  (Suggest/Analyzing/AnalyzingSuggester.cs) — the FST-with-weights
  becomes the term-sorted stats table: a prefix scan + top-n by weight
  (ttf, the "popularity" analogue), parquet min/max pruning doing the
  FST seek's job.
- spell_suggest: DirectSpellChecker (Spell/DirectSpellChecker.cs) — the
  candidate enumeration is a pushdown dictionary scan with a length
  window + Damerau distance (DirectSpellChecker uses the transposing
  fuzzy automaton, INTERNAL_LEVENSHTEIN comparator), ranked by
  (distance ASC, docFreq DESC, term ASC); a word present in the
  dictionary with df >= max_query_frequency yields no suggestions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


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
) -> DataFrame:
    """Correction candidates for `word`: dictionary terms within
    `max_edits` Damerau edits (excluding the word itself), ranked
    (dist ASC, df DESC, term ASC) — DirectSpellChecker.SuggestSimilar.

    The distance runs driver-free: a pushdown scan of the term dictionary
    with a length-window prefilter, then the exact OSA distance via a
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
    return scored.orderBy(F.asc("dist"), F.desc("df"), F.asc("term")).limit(n)
