"""C4-style web-page cleaning (Raffel et al. 2020, "Exploring the Limits
of Transfer Learning" §2.2 — the public C4 heuristics).

Line-level: keep only lines that end in terminal punctuation AND have at
least `min_words_per_line` (5) words. Page-level: keep only pages with
at least `min_sentences` (3) sentences after line filtering, no
"lorem ipsum", and no curly brace.

Everything is pure Column expressions over split/filter/aggregate —
whole-stage codegen, zero shuffles, so at 100 TB the filter rides the
parquet scan exactly like the quality/gopher filters in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean_stats", "c4_clean_filter"]

_TERMINAL = (".", "!", "?", '"')


def _kept_lines(text_col, min_words_per_line: int):
    lines = F.split(text_col, "\n")
    ends_punct = lambda ln: F.substring(ln, -1, 1).isin(*_TERMINAL)  # noqa: E731
    enough_words = lambda ln: F.size(F.split(ln, " ")) >= min_words_per_line  # noqa: E731
    return lines, F.filter(lines, lambda ln: ends_punct(ln) & enough_words(ln))


def c4_clean_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """(doc_id, n_lines, n_kept_lines, n_sentences, kept): the C4 page
    decision with its intermediate counters. Sentences are counted as
    terminal-punctuation occurrences in the KEPT lines (C4 applies the
    sentence threshold to the line-filtered page)."""
    lines, kept = _kept_lines(F.col(text_col), min_words_per_line)
    kept_text = F.array_join(kept, "\n")
    # terminal-char count via translate-delete (cross-engine stable,
    # avoids empty-pattern split semantics)
    n_sentences = F.length(kept_text) - F.length(
        F.translate(kept_text, "".join(_TERMINAL), "")
    )
    bad_page = F.lower(F.col(text_col)).contains("lorem ipsum") | F.col(
        text_col
    ).contains("{")
    return docs.select(
        id_col,
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        ((n_sentences >= min_sentences) & ~bad_page).alias("kept"),
    )


def c4_clean_filter(docs: DataFrame, **kw) -> DataFrame:
    """Pages surviving the C4 rules, original columns preserved."""
    id_col = kw.get("id_col", "doc_id")
    stats = c4_clean_stats(docs, **kw)
    return docs.join(
        stats.filter(F.col("kept")).select(id_col), id_col, "left_semi"
    )
