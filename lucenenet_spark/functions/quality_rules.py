"""Published corpus-quality rule sets: Gopher (MassiveText) and C4.

Two heuristic filter families every large pretraining pipeline runs:

- **Gopher rules** (Rae et al. 2021, appendix A — published): document
  kept iff word count in [50, 100k], mean word length in [3, 10],
  symbol-to-word ratio (``#``/ellipsis) <= 0.1, >= 80% of words contain
  a letter, and at least 2 hits from an 8-word English stop list.
- **C4 line rewriting** (Raffel et al. 2020 §2.2): the line predicate
  itself lives in functions/c4.py (c4_clean_stats — single source of
  truth for the published rule, incl. the lorem-ipsum/brace page rules);
  this module adds the step c4.py leaves out: REWRITING each surviving
  page down to only its kept lines, which is what the C4 pipeline
  actually emits.

Scale design: both are pure per-row Column arithmetic — ``split`` +
array expressions + regexps, ZERO shuffles and no Python. Complements
the neighbouring signal modules (repetition.py = Gopher's repetition
rules, c4.py = the C4 page decision, lm_quality.py = the CCNet LM cut,
pii.py, urls.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher's "must contain at least 2 of these" stop list (Rae et al. 2021)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _q(col: Column) -> Column:
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)).cast("long")


def gopher_quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words, mean_word_len_q, alpha_frac_q, stop_hits,
    symbol_ratio_q): the Gopher rule inputs, quantized 1e-4 where
    fractional. All per-row array arithmetic, no shuffle."""
    toks = F.array_remove(F.split(F.col(text_col), " "), "")
    n = F.size(toks)
    total_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    alpha = F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}")))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*GOPHER_STOPS))
    )
    hashes = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[#]|\.\.\.|…", "")
    )
    safe_n = F.greatest(n, F.lit(1))
    return df.select(
        id_col,
        n.cast("long").alias("n_words"),
        _q(total_len / safe_n).alias("mean_word_len_q"),
        _q(alpha / safe_n).alias("alpha_frac_q"),
        stop_hits.cast("long").alias("stop_hits"),
        _q(hashes / safe_n).alias("symbol_ratio_q"),
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.80,
    min_stop_hits: int = 2,
    max_symbol_ratio: float = 0.10,
) -> DataFrame:
    """Keep documents passing every Gopher rule (published defaults)."""
    s = gopher_quality_stats(df, text_col=text_col, id_col=id_col)
    keep = s.filter(
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len_q").between(
            int(min_mean_len * 10000), int(max_mean_len * 10000)
        )
        & (F.col("alpha_frac_q") >= int(min_alpha_frac * 10000))
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("symbol_ratio_q") <= int(max_symbol_ratio * 10000))
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """(id, n_lines, n_kept, page_kept, clean_text): the C4 line filter
    plus the rewrite — the line predicate (terminal punctuation AND at
    least ``min_words`` words) is c4.py's, shared so the rule has one
    definition; the page survives iff at least ``min_kept_lines`` lines
    survive, and ``clean_text`` is those lines re-joined with newlines
    (empty string when none survive)."""
    from lucenenet_spark.functions.c4 import _kept_lines

    lines, kept = _kept_lines(F.col(text_col), min_words)
    return df.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(kept) >= F.lit(min_kept_lines)).alias("page_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The surviving pages with their cleaned text substituted in —
    the C4 pipeline's output shape."""
    cleaned = c4_clean_lines(
        df,
        text_col=text_col,
        id_col=id_col,
        min_words=min_words,
        min_kept_lines=min_kept_lines,
    )
    keep = cleaned.filter(F.col("page_kept")).select(id_col, "clean_text")
    return (
        df.join(keep, id_col)
        .drop(text_col)
        .withColumnRenamed("clean_text", text_col)
    )
