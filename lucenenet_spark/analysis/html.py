"""HTML -> text extraction (CharFilter stage).

The reference's analogue is HTMLStripCharFilter
(src/Lucene.Net.Analysis.Common/Analysis/CharFilter/HTMLStripCharFilter.cs,
JFlex-generated ~32k lines): strip tags/comments/scripts, decode entities,
pre-tokenizer. Ours is a vectorized pandas implementation for the webtext
corpus shape (input_hint: html = <html><body> + text + </body></html>;
per-row invariant: extract(html) == text BYTE-IDENTICALLY per url).

The general path strips tags/scripts/styles with C-level pandas str ops —
not a browser-grade parser; the invariant test pins the supported shapes.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TAG_RE = re.compile(r"(?s)<[^>]*>")

_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'", "&nbsp;": " "}


def extract_text_batch(html: pd.Series) -> pd.Series:
    """Strip tags + decode common entities on a batch of html strings."""
    s = html.fillna("")
    if s.dtype == object and len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
        s = s.str.decode("utf-8", errors="replace")
    s = s.astype(str)
    s = s.str.replace(_SCRIPT_RE, "", regex=True)
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES.items():
        s = s.str.replace(ent, ch, regex=False)
    return s


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Adds `out_col` = extract(html) via mapInPandas (vectorized, no
    per-row Python UDF). Column order is preserved; an existing out_col is
    replaced."""
    fields = [f for f in df.schema.fields if f.name != out_col]
    schema = T.StructType(fields + [T.StructField(out_col, T.StringType(), True)])
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = extract_text_batch(pdf[html_col])
            yield pdf[names]

    return df.mapInPandas(run, schema)


def extraction_invariant_violations(
    df: DataFrame, html_col: str = "html", text_col: str = "text", url_col: str = "url"
) -> DataFrame:
    """Rows where extract(html) != text — the per-row invariant check
    (input_hint: byte-identical extracted text per url). Empty = pass."""
    extracted = with_extracted_text(
        df.select(url_col, html_col, text_col), html_col=html_col, out_col="_extracted"
    )
    return extracted.filter(F.col("_extracted") != F.col(text_col)).select(
        url_col, text_col, "_extracted"
    )
