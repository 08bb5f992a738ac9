"""Round-5d driver gates: Lucene.Net.Expressions surface.

Each gate compiles an expression-language source string to a Spark
Column (search/expressions.py) and checks it against a DuckDB oracle
evaluating the same arithmetic in SQL. Quantization follows the repo
convention (floor(x*1e4+0.5) bigint) for transcendental results; the
bitwise/ternary gate stays in exact integer space so its values hash
exactly with no quantization.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import GATE_QUERIES, gate, get_engine
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _Q, _tsc


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


# ==========================================================================
# ExpressionSortField: sort orders by a compiled javascript expression
# (Expressions/ExpressionSortField.cs + JS/JavascriptCompiler.cs)
# ==========================================================================
@gate(
    "expression_sort",
    """
SELECT o_orderkey,
       CAST(floor((ln(o_totalprice + 1) + 0.1 * sqrt(CAST(o_custkey AS DOUBLE)))
                  * 10000 + 0.5) AS BIGINT) AS expr_q
FROM orders
ORDER BY expr_q DESC, o_orderkey ASC
LIMIT 20
""",
)
def expression_sort_gate(spark, sf_dir):
    """Top-20 orders by `ln(o_totalprice + 1) + 0.1 * sqrt(o_custkey)`
    compiled via the expression language (JavascriptCompiler.Compile +
    ExpressionSortField) — the whole expression lowers to Catalyst ops,
    executed as TakeOrderedAndProject (no global sort)."""
    from lucenenet_spark.search.expressions import SimpleBindings, expression_sort

    df = _orders(spark, sf_dir)
    b = SimpleBindings().add_field("o_totalprice").add_field("o_custkey")
    out = expression_sort(
        df, "ln(o_totalprice + 1) + 0.1 * sqrt(o_custkey)", b,
        k=20, tie_col="o_orderkey", out_col="expr_value",
    )
    return out.select(
        "o_orderkey",
        F.floor(F.col("expr_value") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("expr_q"),
    )


# ==========================================================================
# Bitwise / comparison / ternary semantics: exact-integer domain so the
# driver hash is quantization-free (JavascriptCompiler bytecode D2L ops)
# ==========================================================================
@gate(
    "expression_bitwise",
    """
SELECT o_orderkey,
       CAST(CASE WHEN (o_custkey & 255) % 2 = 0
                 THEN ((o_custkey & 63) << 2) | (o_orderkey % 7)
                 ELSE xor(o_custkey & 1023, 21) + (o_orderkey % 5)
            END AS BIGINT) AS expr_v
FROM orders
ORDER BY o_orderkey ASC
LIMIT 200
""",
)
def expression_bitwise_gate(spark, sf_dir):
    """Ternary + comparison + bitwise and/or/xor/shift over integer-valued
    doubles: `(o_custkey & 255) % 2 == 0 ? ((o_custkey & 63) << 2) |
    (o_orderkey % 7) : (o_custkey & 1023 ^ 21) + (o_orderkey % 5)`.
    All intermediates stay integers < 2^53 so the double arithmetic is
    exact and the bigint cast loses nothing (DuckDB spells xor as a
    function, '^' being exponentiation there)."""
    from lucenenet_spark.search.expressions import compile_expression

    df = _orders(spark, sf_dir)
    expr = compile_expression(
        "(o_custkey & 255) % 2 == 0"
        " ? ((o_custkey & 63) << 2) | (o_orderkey % 7)"
        " : ((o_custkey & 1023) ^ 21) + (o_orderkey % 5)"
    )
    col = expr.column({"o_custkey": df["o_custkey"], "o_orderkey": df["o_orderkey"]})
    return (
        df.select("o_orderkey", col.cast("long").alias("expr_v"))
        .orderBy(F.col("o_orderkey").asc())
        .limit(200)
    )


# ==========================================================================
# ExpressionRescorer: BM25 first pass, expression second pass blending
# _score with a stored numeric doc value (Expressions/ExpressionRescorer.cs)
# ==========================================================================
@gate(
    "expression_rescore",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, first_pass AS (
  SELECT doc_id, score FROM ({_tsc('merge')})
  ORDER BY {_Q} DESC, doc_id ASC LIMIT 50
)
SELECT f.doc_id,
       CAST(floor((0.7 * f.score + 0.3 * log10(1 + d.n_chars)) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM first_pass f JOIN documents d USING (doc_id)
ORDER BY score_q DESC, f.doc_id ASC LIMIT 10
""",
)
def expression_rescore_gate(spark, sf_dir):
    """Top-50 BM25 hits for 'merge' re-ranked by the compiled expression
    `0.7 * _score + 0.3 * log10(1 + n_chars)` joined against the stored
    n_chars doc value — the ExpressionRescorer pattern: rescoring cost is
    O(first-pass hits), not O(corpus)."""
    from lucenenet_spark.search.expressions import SimpleBindings, expression_rescore
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    hits = (
        s.scored(TermQuery("merge"))
        .orderBy(
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").desc(),
            F.col("doc_id").asc(),
        )
        .limit(50)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    out = expression_rescore(
        hits,
        "0.7 * _score + 0.3 * log10(1 + n_chars)",
        SimpleBindings().add_field("n_chars"),
        k=10,
    )
    return out.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
