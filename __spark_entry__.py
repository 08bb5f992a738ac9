"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship top-k BM25 query at sf0.001.
queries()      — every implemented operator (SURVEY.md §2) as
                 (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL per query (CORRECTNESS gate).

The real implementations live in lucenenet_spark/plans/gate*.py; this file
is a thin adapter so the driver can import it standalone.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lucenenet_spark.plans import gate as _gate  # noqa: E402
from lucenenet_spark.plans import gate_pipeline as _gate_pipeline  # noqa: E402  (registers entries)
from lucenenet_spark.plans import gate_more as _gate_more  # noqa: E402  (registers entries)
from lucenenet_spark.plans import gate_fields as _gate_fields  # noqa: E402  (registers entries)
from lucenenet_spark.plans import gate_modules as _gate_modules  # noqa: E402  (registers entries)
from lucenenet_spark.plans import gate_round3 as _gate_round3  # noqa: E402  (registers entries)
from lucenenet_spark.plans import gate_round3b as _gate_round3b  # noqa: E402  (registers entries)

GATE = _gate.GATE_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-10 BM25 for a term over the sf0.001 documents."""
    fn, _ = GATE["term_query_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in GATE.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in GATE.items() if sql is not None}
