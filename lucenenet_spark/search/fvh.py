"""FastVectorHighlighter analogue: phrase-aware highlighting from the
index's stored positions.

Reference: Highlighter/VectorHighlight/FastVectorHighlighter.cs (287) +
FieldPhraseList.cs — the FVH's defining behavior vs the re-analyzing
Highlighter is that it works off TERM VECTORS (per-doc positions stored at
index time) and highlights only the term occurrences that PARTICIPATE in
a phrase match: searching "key agg" marks 'key' only when 'agg' follows,
never isolated 'key's (FieldPhraseList builds phrase-match position
runs).

Spark-first: our postings already carry per-doc positions (the term
vector), so phrase-match starts come from the same position join the
phrase scorer uses; the fragment is cut around the first match
(SimpleFragListBuilder order) and matched positions are wrapped by a
transform over the token window. One plan, no re-analysis, no Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def fvh_phrase_fragments(
    index: InvertedIndex,
    docs: DataFrame,
    terms: list[str],
    pre_tokens: int = 3,
    post_tokens: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    field: str | None = None,
) -> DataFrame:
    """(doc_id, frag): one fragment per doc matching the consecutive
    phrase `terms`, phrase-participating tokens wrapped in <b>...</b>.

    Fragment window: [first_match - pre_tokens, first_match + len(terms)
    - 1 + post_tokens], clamped to the doc (SimpleFragListBuilder's
    in-order first fragment). Docs without a phrase match are dropped."""
    fld = field or index.default_field
    n = len(terms)
    assert n >= 2

    def pos_of(t: str, alias: str) -> DataFrame:
        return (
            index.postings.filter((F.col("field") == fld) & (F.col("term") == t))
            .select("doc_id", F.explode("positions").alias(alias))
        )

    joined = pos_of(terms[0], "p0")
    for i in range(1, n):
        joined = joined.join(pos_of(terms[i], f"p{i}"), "doc_id").filter(
            F.col(f"p{i}") == F.col("p0") + i
        )
    occ = joined.select(
        "doc_id", F.col("p0"), F.array(*[F.col(f"p{i}") for i in range(n)]).alias("ps")
    )
    matches = occ.groupBy("doc_id").agg(
        F.min("p0").alias("m0"),
        F.array_distinct(F.flatten(F.collect_list("ps"))).alias("mset"),
    )

    j = matches.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")),
        "doc_id",
    )
    toks = F.split(F.col("_text"), " ")
    ws = F.greatest(F.lit(0), F.col("m0") - F.lit(pre_tokens))
    we = F.least(F.size(toks) - F.lit(1), F.col("m0") + F.lit(n - 1 + post_tokens))
    tok_at = lambda i: F.element_at(toks, (i + F.lit(1)).cast("int"))  # noqa: E731
    frag = F.concat_ws(
        " ",
        F.transform(
            F.sequence(ws.cast("int"), we.cast("int")),
            lambda i: F.when(
                F.array_contains(F.col("mset"), i),
                F.concat(F.lit("<b>"), tok_at(i), F.lit("</b>")),
            ).otherwise(tok_at(i)),
        ),
    )
    return j.select("doc_id", frag.alias("frag"))
