"""Sharded serving: distributed top-k merge and static index pruning.

Two operators a multi-node deployment of this engine runs on every query
and every index build:

* ``shard_merge_topk`` — the distributed query fan-out/merge step.
  Reference semantics: ``TopDocs.Merge`` (src/Lucene.Net/Search/TopDocs.cs,
  MergeSortQueue: score DESC, then shardIndex ASC, then local doc ASC) over
  per-shard ``TopScoreDocCollector`` results, with shards as contiguous
  docBase ranges exactly like ``IndexSearcher``'s leaf slices
  (src/Lucene.Net/Search/IndexSearcher.cs:835-838, ReaderUtil.SubIndex:
  global docID = docBase + local docID).  Because shards are contiguous
  ranges, (shardIndex ASC, local doc ASC) == global doc_id ASC, so the
  merged page is provably identical to the single-searcher page — which is
  what makes the fan-out transparent to users.  At 100 TB this is the
  serving plan: each executor computes its own k-row heap over its slice
  (a window per shard, map-side), and only shards×k rows reach the final
  ordered take.

* ``prune_index_topm`` — static impact-based index pruning
  (Carmel et al., "Static Index Pruning for Information Retrieval
  Systems", SIGIR 2001): keep only the top-m highest-impact postings of
  every term, where impact is the SAME BM25 partial the searcher computes
  at query time (idf * (k1+1) * tf / (tf + k1*((1-b) + b*dl/avgdl))).
  Collection statistics (df/ttf/avgdl/maxDoc) are kept GLOBAL — pruning
  changes which postings exist, never how survivors score — so any
  single-term top-k with k <= m is rank- and score-identical to the
  unpruned index while the posting store shrinks by orders of magnitude
  for stopword-scale terms.  This is the scale lever for a serving tier:
  the full index stays on cheap storage, the pruned one serves.
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import B, K1, IndexSearcher


def shard_merge_topk(
    searcher: IndexSearcher,
    query,
    n_shards: int = 4,
    k: int = 10,
    quantum: float = 10000.0,
) -> DataFrame:
    """Per-shard top-k then TopDocs.Merge, over contiguous doc_id slices.

    Returns (rank, shard_id, doc_id, score_q): the merged global page with
    the shard each hit was served from.  Scores are quantized BEFORE the
    per-shard selection so the shard-local tie-break (score_q DESC,
    doc_id ASC) composes exactly with the merge order (score_q DESC,
    shard ASC, local doc ASC) into the global single-searcher order.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    span = max(1, math.ceil(searcher.index.max_doc / n_shards))
    scored = searcher.scored(query).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(quantum) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    sliced = scored.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(span)).cast("long")
    ).withColumn("local_doc", F.col("doc_id") - F.col("shard_id") * F.lit(span))
    # per-shard TopScoreDocCollector: k rows survive per slice
    per_shard = Window.partitionBy("shard_id").orderBy(
        F.desc("score_q"), F.asc("local_doc")
    )
    heads = sliced.withColumn("shard_rank", F.row_number().over(per_shard)).filter(
        F.col("shard_rank") <= k
    )
    # TopDocs.Merge: score DESC, shardIndex ASC, local doc ASC
    merged = heads.orderBy(
        F.desc("score_q"), F.asc("shard_id"), F.asc("local_doc")
    ).limit(k)
    final = Window.orderBy(F.desc("score_q"), F.asc("shard_id"), F.asc("local_doc"))
    return merged.withColumn("rank", F.row_number().over(final)).select(
        "rank", "shard_id", "doc_id", "score_q"
    )


def posting_impact_q(
    df_col, tf_col, dl_col, max_doc: int, avgdl: float, quantum: float = 10000.0
):
    """Quantized per-posting BM25 impact — the double-mode score a
    single-term query assigns this posting (searcher._idf/_score_col
    composition), as one whole-stage-codegen Column expression."""
    n = float(max_doc)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - df_col.cast("double") + F.lit(0.5))
        / (df_col.cast("double") + F.lit(0.5))
    )
    nrm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * dl_col.cast("double") / F.lit(avgdl)
    )
    tf = tf_col.cast("double")
    score = idf * F.lit(K1 + 1.0) * tf / (tf + nrm)
    return F.floor(score * F.lit(quantum) + F.lit(0.5)).cast("long")


def prune_index_topm(
    idx: InvertedIndex, m: int, field: str | None = None
) -> InvertedIndex:
    """Static top-m impact pruning of one field's postings (Carmel
    SIGIR'01).  Survivor selection order is (impact_q DESC, doc_id ASC) —
    the same quantized order the oracle and collectors use — so the
    pruned index's single-term top-k (k <= m) is identical to the full
    index's.  Global stats (term_stats, doclens, max_doc, sum_ttf) are
    untouched: survivors score exactly as before."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    fld = field or idx.default_field
    target = idx.postings.filter(F.col("field") == fld)
    rest = idx.postings.filter(F.col("field") != fld)
    avgdl = idx.avgdl_double_for(fld)
    stats = idx.term_stats.filter(F.col("field") == fld).select(
        F.col("field"), F.col("term"), F.col("df")
    )
    impact = posting_impact_q(
        F.col("df"), F.col("tf"), F.col("dl"), idx.max_doc, avgdl
    )
    w = Window.partitionBy("field", "term").orderBy(
        F.desc("impact_q"), F.asc("doc_id")
    )
    pruned = (
        target.join(stats, ["field", "term"])
        .withColumn("impact_q", impact)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .drop("df", "impact_q", "_rk")
        .select(*target.columns)
    )
    return dataclasses.replace(idx, postings=pruned.unionByName(rest))
