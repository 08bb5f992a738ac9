"""PII scrubbing for training-data pipelines.

Replaces personally-identifiable spans with typed placeholder tags, the
standard pre-training redaction pass (beyond the reference's scope; part
of this engine's LLM-pipeline operator family alongside dedup/quality).

All patterns run as JVM-side ``regexp_replace`` column expressions — no
Python in the hot path, fully pushdown/codegen friendly, and the regex
subset used (character classes, bounded repetition, ``\\b``) evaluates
identically under Java regex (Spark) and RE2 (DuckDB oracles).

Order is load-bearing: SSN before the generic phone pattern (an SSN's
tail would otherwise match as a phone), email before IPv4-in-hostname
edge cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (tag, pattern) in application order
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}-\d{3}-\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("CARD", r"\b\d{4} \d{4} \d{4} \d{4}\b"),
)


def scrub_pii_col(text: Column) -> Column:
    """Column expression chaining the typed replacements."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans in ``text_col`` with ``<TAG>`` placeholders."""
    return df.withColumn(text_col, scrub_pii_col(F.col(text_col)))


def pii_sql_expr(col: str = "text") -> str:
    """The equivalent DuckDB expression (oracle construction helper)."""
    expr = col
    for tag, pat in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '<{tag}>', 'g')"
    return expr
