"""Small Lucene.Net.Misc utilities over the index tables.

- ``GetTermInfo`` (reference ``Lucene.Net.Misc/Misc/GetTermInfo.cs``):
  print docFreq + totalTermFreq for one (field, term). Here it is a
  pushed equality predicate on the term-stats table — a metadata lookup,
  never a postings scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["term_info"]


def term_info(index, term: str, field: str | None = None) -> DataFrame:
    """(term, df, ttf) for one term — GetTermInfo.TermInfo semantics
    (docFreq, totalTermFreq via TermsEnum seek)."""
    fld = field or index.default_field
    stats = index.term_stats
    if "field" in stats.columns:
        stats = stats.filter(F.col("field") == fld)
    return stats.filter(F.col("term") == term).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )
