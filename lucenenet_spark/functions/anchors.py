"""Anchor-text aggregation over a document link graph.

Web search engines index the ANCHOR TEXT of incoming links alongside a
page's own content — Brin & Page 1998 ("The Anatomy of a Large-Scale
Hypertextual Web Search Engine", §2.2) made it a core signal because the
link's surrounding words often describe the target better than the
target's own text, and modern corpus pipelines use aggregated anchors
both as retrieval fields and as LLM training data (e.g. the MS MARCO
anchor corpus shape). This module aggregates per-target anchor strings
from an edge list:

    (src, dst, anchor) -> per dst: in-link count, distinct-source count,
                          bounded sorted set of distinct anchor strings

Scale design (what must survive a 10^12-page crawl):
- ONE groupBy(dst) with map-side partial aggregation is the whole job;
  no self-join, no driver state. Hub pages (millions of in-links) are
  the classic skew key: the count/countDistinct partials pre-combine
  per partition, and the anchor-set column is explicitly BOUNDED
  (``max_anchors`` slice after sort) so a hub's state can't grow
  unboundedly — the same cap strategy the dedup band-bucket join uses.
- On a real crawl, countDistinct(src) for hub keys would switch to an
  approx_count_distinct or a two-stage (dst, src) pre-dedup; kept exact
  here because the gate's oracle is exact.

The synthetic edge generator reuses the deterministic Knuth-hash link
graph from ``functions/pagerank.py`` (node s emits 1 + s % 3 edges,
edge j targets (s*2654435761 + 40503*(j+1)) % N, self-loops deflected),
and the anchor for edge j is the 3-token window of the SOURCE document
starting at token offset j — fully reproducible in SQL so the DuckDB
oracle regenerates graph and anchors bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions.pagerank import KNUTH, STRIDE


def build_anchor_edges(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", anchor_len: int = 3
) -> DataFrame:
    """Deterministic (src, dst, anchor) edge list over the corpus.

    Mirrors pagerank.build_link_graph's integer arithmetic exactly and
    derives each edge's anchor from the source text: edge j carries the
    ``anchor_len``-token window starting at 0-indexed token offset j
    (out-of-range slots drop out of concat_ws, like a short real anchor).
    Pure Column plan: split → filter → explode(sequence) → modular hash.
    """
    n_df = docs.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    src = docs.select(F.col(id_col).cast("long").alias("src"), toks.alias("toks"))
    e = (
        src.crossJoin(F.broadcast(n_df))
        .select(
            "src",
            "toks",
            "_n",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("src") % 3)).alias("j"),
        )
    )
    t = ((F.col("src") % F.col("_n")) * F.lit(KNUTH) + F.lit(STRIDE) * (F.col("j") + 1)) % F.col("_n")
    anchor = F.concat_ws(
        " ", *[F.get(F.col("toks"), (F.col("j") + F.lit(i)).cast("int")) for i in range(anchor_len)]
    )
    return e.select(
        "src",
        F.when(t == F.col("src"), (t + 1) % F.col("_n")).otherwise(t).alias("dst"),
        anchor.alias("anchor"),
    )


def anchor_text_agg(
    edges: DataFrame, k: int = 20, max_anchors: int = 64
) -> DataFrame:
    """Per-target anchor aggregation: (dst, n_anchors, n_src, anchors_cat).

    anchors_cat is the sorted DISTINCT anchor strings joined with '|',
    capped at ``max_anchors`` entries so hub-page state stays bounded.
    Deterministic total order: in-link count DESC, dst ASC.
    """
    agg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.countDistinct("src").cast("long").alias("n_src"),
        F.array_join(
            F.slice(F.array_sort(F.collect_set("anchor")), 1, max_anchors), "|"
        ).alias("anchors_cat"),
    )
    return agg.orderBy(F.desc("n_anchors"), F.asc("dst")).limit(k)
