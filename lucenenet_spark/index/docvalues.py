"""DocValues updates: in-place per-document column updates without
reindexing.

Reference: src/Lucene.Net/Index/NumericDocValuesFieldUpdates.cs and
BinaryDocValuesFieldUpdates.cs — IndexWriter.UpdateNumericDocValue
records (term -> new value) update packets that resolve against segments
at flush, last-write-wins by update generation. The columnar analogue is
a MERGE: the doc-values relation is any (doc_id, value) DataFrame, and an
update batch overrides matching rows. On an Iceberg/Delta table this is
literally `MERGE INTO dv USING updates ON dv.doc_id = updates.doc_id
WHEN MATCHED THEN UPDATE`; here it is expressed as the equivalent
declarative union + anti-join so it runs on any DataFrame source — one
shuffle on the key, broadcastable when the update batch is small (the
normal case: updates are tiny relative to the corpus)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_doc_values_updates(
    dv: DataFrame, *update_batches: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Apply update batches to a doc-values relation, later batches
    winning (update generations: DocValuesFieldUpdates.Gen ordering).
    Rows absent from every batch keep their value; update rows for
    unknown keys are ignored (the reference resolves updates via a term
    that must match an existing doc).

    Each batch application is: updates semi-joined to known keys, base
    rows anti-joined away where updated. Spark broadcasts the small side
    automatically (AQE); no full rewrite of the base relation happens
    until an action materializes it — the lazy-resolve-at-flush shape."""
    out = dv
    for upd in update_batches:
        upd_known = upd.join(out.select(key).distinct(), key, "left_semi")
        out = out.join(upd_known, key, "left_anti").unionByName(upd_known)
    return out


def numeric_doc_values(df: DataFrame, key: str, value_col: str) -> DataFrame:
    """Project a (doc_id, value) numeric doc-values relation from any
    table (NumericDocValuesField at index time)."""
    return df.select(F.col(key), F.col(value_col).alias("value"))
