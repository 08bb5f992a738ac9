"""Collation-key sorting (ICUCollationKeyAnalyzer semantics, documented
locale subset).

Reference: ``src/Lucene.Net.Analysis.ICU/Collation/ICUCollationKeyAnalyzer.cs``
(and the older ``CollationKeyAnalyzer``) index each value's locale
collation sort key so that a plain byte-order sort of the keyed field IS
the locale order. The ICU library is not available in this environment,
so the faithful part here is the *architecture* — key derivation is a
pure Column expression evaluated in whole-stage codegen, the sort runs on
the derived key, and keys are deterministic and index-storable — while
the tailoring itself is a documented subset: German DIN 5007-2
("phonebook") ordering, the canonical ICU tailoring example
(``de__PHONEBOOK`` in the reference's CollationTestBase.cs tests):

  ä → ae, ö → oe, ü → ue, ß → ss, case-insensitive primary strength.

Other locales plug in by mapping a new expansion table; the sort/key
plumbing is locale-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["german_phonebook_key", "collation_sort"]

# DIN 5007-2 expansions, applied after lower-casing (so Ä and ä agree).
_DE_PHONEBOOK = (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss"))


def german_phonebook_key(col: Column | str) -> Column:
    """Primary-strength DIN 5007-2 collation key as a Column expression."""
    key = F.lower(F.col(col) if isinstance(col, str) else col)
    for src, dst in _DE_PHONEBOOK:
        key = F.replace(key, F.lit(src), F.lit(dst))
    return key


def collation_sort(
    df: DataFrame,
    value_col: str,
    *,
    key_fn=german_phonebook_key,
    id_col: str = "doc_id",
    k: int | None = None,
    key_out: str = "ckey",
) -> DataFrame:
    """Order rows by the collation key of ``value_col`` (ties by id).

    The key is materialized as a column (what the reference stores as the
    indexed CollationKey term) and the sort happens on it — with a LIMIT
    this is a TakeOrdered, never a global sort."""
    out = df.withColumn(key_out, key_fn(value_col)).orderBy(
        F.asc(key_out), F.asc(id_col)
    )
    return out.limit(k) if k is not None else out


def collated_term_range(
    df: DataFrame,
    value_col: str,
    lo: str | None,
    hi: str | None,
    *,
    include_lo: bool = True,
    include_hi: bool = False,
    key_fn=german_phonebook_key,
) -> DataFrame:
    """TermRangeQuery under locale order — the documented use-case of
    CollationKeyAnalyzer (reference CollationKeyAnalyzer.cs class doc:
    index CollationKeys "for use with TermRangeQuery"; TermRangeQuery.cs
    includeLower/includeUpper semantics, None = open end).

    The bounds are collated with the SAME key function as the values, and
    the comparison is a plain pushdown predicate on the derived key
    column — binary order over keys IS locale order, which is the whole
    point of the key transform."""
    key = key_fn(value_col)
    cond = F.lit(True)
    if lo is not None:
        lo_key = key_fn(F.lit(lo))
        cond = cond & (key >= lo_key if include_lo else key > lo_key)
    if hi is not None:
        hi_key = key_fn(F.lit(hi))
        cond = cond & (key <= hi_key if include_hi else key < hi_key)
    return df.filter(cond)
