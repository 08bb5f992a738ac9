"""Proximity-boosted ranking: BM25 plus a term-pair distance bonus.

Classic IR result (Büttcher, Clarke & Lushman SIGIR'06 "Term proximity
scoring for ad-hoc retrieval on very large text collections"): add a
bonus decreasing in the minimum distance between query-term occurrences
to the per-term BM25 sum. Lucene expresses the same intent through
SpanNearQuery / sloppy PhraseQuery slop weighting (PhraseQuery.cs slop
-> SloppyPhraseScorer freq contribution); this module implements the
explicit additive form over the engine's positional postings.

Spark shape: the per-term scored frames join on doc_id (conjunction),
and the distance comes from ONE join of the two terms' postings rows —
the positions arrays are already co-located per (term, doc), so the
min-distance is a pure Column expression (transform × transform →
flatten → array_min), no explode, no shuffle beyond the doc_id joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def min_pair_distance(index: InvertedIndex, term_a: str, term_b: str,
                      field: str | None = None) -> DataFrame:
    """(doc_id, mindist): min |pa - pb| over all position pairs, for
    docs containing BOTH terms. Integer-exact."""
    fld = field or index.default_field
    base = index.postings.filter(F.col("field") == fld)
    p1 = base.filter(F.col("term") == term_a).select(
        "doc_id", F.col("positions").alias("pos1")
    )
    p2 = base.filter(F.col("term") == term_b).select(
        "doc_id", F.col("positions").alias("pos2")
    )
    return p1.join(p2, "doc_id").select(
        "doc_id",
        F.expr(
            "array_min(flatten(transform(pos1, x -> transform(pos2, y -> abs(x - y)))))"
        ).cast("long").alias("mindist"),
    )


def proximity_boost_topk(
    searcher: IndexSearcher,
    term_a: str,
    term_b: str,
    k: int = 10,
) -> DataFrame:
    """Top-k by BM25(term_a) + BM25(term_b) + 1/(1 + mindist), conjunctive.

    The bonus divides by an exact integer, so the blended double is the
    same IEEE expression in any engine; quantized to score_q 1e4."""
    sa = searcher.scored(TermQuery(term_a)).select("doc_id", F.col("score").alias("sa"))
    sb = searcher.scored(TermQuery(term_b)).select("doc_id", F.col("score").alias("sb"))
    md = min_pair_distance(searcher.index, term_a, term_b)
    out = (
        sa.join(sb, "doc_id")
        .join(md, "doc_id")
        .select(
            "doc_id",
            F.floor(
                (F.col("sa") + F.col("sb") + F.lit(1.0) / (F.lit(1) + F.col("mindist")))
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("score_q"),
        )
    )
    return out.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(k)
