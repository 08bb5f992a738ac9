"""Highlighting: best-fragment extraction with term markers.

Reference: Lucene.Net.Highlighter — Highlighter+QueryScorer re-analyze the
stored text and pick the fragment with the highest sum of matched-term
scores (Highlight/Highlighter.cs GetBestFragments). Ours is a vectorized
mapInPandas over (doc_id, text): re-tokenize the batch with the engine
analyzer, slide fixed-size windows, pick the window with the most query
term hits, wrap hits in <b></b> — the same re-analyze strategy, batch-wise.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from lucenenet_spark.analysis.analyzers import StandardAnalyzer

HIGHLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fragment", T.StringType(), True),
        T.StructField("n_hits", T.IntegerType(), False),
    ]
)


def highlight(
    docs: DataFrame,
    query_terms: list[str],
    fragment_tokens: int = 12,
    analyzer: StandardAnalyzer | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """(doc_id, fragment, n_hits): best window of `fragment_tokens` raw
    tokens by query-term hit count; terms wrapped in markers. Docs with no
    hit get fragment=None, n_hits=0."""
    analyzer = analyzer or StandardAnalyzer()
    terms = set(query_terms)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_frag: list[str | None] = []
            out_hits: list[int] = []
            raw_lists = pdf[text_col].fillna("").str.split()
            # ONE batch pipeline pass over every raw token of the batch
            # (each raw token = one 1-token "document"); per-token
            # tokenize_text calls were thousands of pandas round-trips per
            # doc — the banned per-row-Python pattern (SURVEY §7).
            flat_tokens = [t for raw in raw_lists for t in raw]
            first_term = np.full(len(flat_tokens), "", dtype=object)
            if flat_tokens:
                row_idx, terms_arr, _pos, _fl = analyzer.tokenize_batch(
                    pd.Series(flat_tokens)
                )
                if len(row_idx):
                    # first emitted term per raw token (stopwords/empty -> "")
                    uniq, first_pos = np.unique(
                        np.asarray(row_idx), return_index=True
                    )
                    first_term[uniq] = np.asarray(terms_arr, dtype=object)[first_pos]
            hit_flat = np.array([a in terms for a in first_term], dtype=np.int32)
            offset = 0
            for raw in raw_lists:
                is_hit = hit_flat[offset : offset + len(raw)]
                offset += len(raw)
                if not is_hit.any():
                    out_frag.append(None)
                    out_hits.append(0)
                    continue
                w = min(fragment_tokens, len(raw))
                window = np.convolve(is_hit, np.ones(w, dtype=np.int32), "valid")
                start = int(window.argmax())
                frag = [
                    (pre + raw[i] + post) if is_hit[i] else raw[i]
                    for i in range(start, start + w)
                ]
                out_frag.append(" ".join(frag))
                out_hits.append(int(window.max()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "fragment": out_frag,
                    "n_hits": np.array(out_hits, dtype=np.int32),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, HIGHLIGHT_SCHEMA)


def token_sources_highlight(
    index,
    docs: DataFrame,
    term: str,
    *,
    field: str = "text",
    text_col: str = "text",
    context: int = 3,
) -> DataFrame:
    """Highlight from the TERM VECTOR, without re-analysis.

    Reference: Highlighter/TokenSources.cs — when a field stores term
    vectors with positions, GetTokenStream reconstructs the token stream
    from the vector instead of re-running the analyzer, and the
    Highlighter consumes that. Here the postings row IS the term vector
    (positions ride on it), so the fragment is built by pure Column
    expressions: first-occurrence position -> token-window slice of the
    stored text -> hit wrapping — whole-stage codegen, no Python, and the
    only join is postings->stored-fields on doc_id.

    Returns (doc_id, fragment, n_hits) for every doc containing `term`,
    n_hits being the doc-level term frequency."""
    from pyspark.sql import functions as F

    post = index.postings
    if "field" in post.columns:
        post = post.filter(F.col("field") == field)
    hits = post.filter(F.col("term") == term).select(
        "doc_id",
        F.element_at("positions", 1).cast("int").alias("p"),
        F.col("tf").cast("int").alias("n_hits"),
    )
    j = docs.select("doc_id", text_col).join(hits, "doc_id")
    toks = F.split(F.col(text_col), " ")
    lo0 = F.greatest(F.lit(0), F.col("p") - context)  # 0-based window start
    length = F.col("p") + context - lo0 + F.lit(1)
    window = F.slice(toks, lo0 + 1, length)
    wrapped = F.transform(
        window,
        lambda x: F.when(x == term, F.concat(F.lit("<b>"), x, F.lit("</b>"))).otherwise(x),
    )
    return j.select(
        "doc_id", F.array_join(wrapped, " ").alias("fragment"), "n_hits"
    )
