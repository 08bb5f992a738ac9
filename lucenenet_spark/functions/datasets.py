"""Train/test/cross-validation dataset splitting — Classification.Utils.

Reference: ``src/Lucene.Net.Classification/Utils/DatasetSplitter.cs:100-165``
— iterate all docs in index order with an ordinal counter ``b``; a doc goes
to the TEST index when ``b % 2 == 0`` and the test index is still under
``size * testRatio`` docs; otherwise to the CROSS-VALIDATION index while it
is under ``size * crossValidationRatio``; otherwise to TRAINING.

Because both quotas fill greedily in ordinal order, the sequential loop has
a closed form over the ordinal alone — no global window, no sequential
state, so the split is embarrassingly parallel at any scale:

- ``test(i)``  ⟺  ``i`` even and ``i div 2 < Q``  (the even doc with even-
  ordinal index ``j = i div 2`` is the ``j``-th test candidate; it is
  admitted iff the count so far, which equals ``j`` while the quota holds,
  is `` < Q = size*testRatio``).
- ``test_before(i) = min((i+1) div 2, ceil(Q))`` — evens before ``i``,
  capped by the quota.
- ``cv(i)``  ⟺  not test and ``i - test_before(i) < CVQ = size*cvRatio``
  (non-test docs are offered to the c.v. index in order, so the c.v. count
  so far equals the non-test count while its quota holds).
- else ``train``.

The ordinal is the dense doc id (the builder assigns 0..maxDoc-1 in index
order, mirroring the reference's MatchAllDocs iteration at
``DatasetSplitter.cs:105,116``). ``size`` is a single count() scalar.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_split(
    docs: DataFrame,
    test_ratio: float,
    cv_ratio: float,
    *,
    ordinal_col: str = "doc_id",
    size: int | None = None,
) -> DataFrame:
    """Label every doc with split ∈ {test, cv, train} per DatasetSplitter's
    sequential semantics (closed form, see module docstring). ``size``
    defaults to ``docs.count()``."""
    if size is None:
        size = docs.count()
    q = float(size) * float(test_ratio)
    cvq = float(size) * float(cv_ratio)
    cq = int(math.ceil(q))

    i = F.col(ordinal_col)
    is_test = ((i % 2) == 0) & (
        F.expr(f"{ordinal_col} div 2") < F.lit(q)
    )
    test_before = F.least(
        F.expr(f"({ordinal_col} + 1) div 2"), F.lit(cq).cast("long")
    )
    is_cv = (i - test_before) < F.lit(cvq)
    return docs.withColumn(
        "split",
        F.when(is_test, F.lit("test"))
        .when(is_cv, F.lit("cv"))
        .otherwise(F.lit("train")),
    )


def dataset_split_sequential(n: int, test_ratio: float, cv_ratio: float) -> list:
    """Pure-Python transliteration of the reference loop
    (DatasetSplitter.cs:113-164) — the test oracle for the closed form."""
    out = []
    test_count = cv_count = 0
    for b in range(n):
        if b % 2 == 0 and test_count < n * test_ratio:
            out.append("test")
            test_count += 1
        elif cv_count < n * cv_ratio:
            out.append("cv")
            cv_count += 1
        else:
            out.append("train")
    return out
