"""Scale-decade probe: headline rows at 1M docs (10x the sf1 evidence,
200x the driver bench corpus) — build, pack, and the four headline
queries through the packed-block serving path, plus WAND pruning stats.

Writes ONE JSON line to stdout and appends a row block to BENCH.md when
--record is passed. Run SOLO (hypervisor contention corrupts timings).

Usage: python tools/scale_probe.py [n_docs] [cpus] [--record]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv
    n_docs = int(args[0]) if args else 1_000_000
    cpus = int(args[1]) if len(args) > 1 else 16

    from pyspark.sql import SparkSession

    from lucenenet_spark import IndexSearcher, build_index
    from lucenenet_spark.search.block_searcher import BlockIndexSearcher
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.testgen import corpus_parquet

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = corpus_parquet(n_docs, os.path.join(REPO, ".bench_cache"))
    corpus = spark.read.parquet(path).repartition(cpus, "doc_id").persist()
    corpus.count()

    t0 = time.time()
    idx = build_index(corpus, text_col="text", id_col="doc_id")
    n_postings = idx.postings.count()
    idx.doclens.count()
    idx.term_stats.count()
    build_sec = time.time() - t0

    t0 = time.time()
    bs = BlockIndexSearcher(idx)
    packed = bs.blocks.persist()
    n_blocks = packed.count()
    nb_parts = max(2, n_blocks // 10_000 + 1)
    bs.blocks = (
        packed.repartitionByRange(nb_parts, "field", "term", "block_id")
        .sortWithinPartitions("field", "term", "block_id")
        .cache()
    )
    bs.blocks.count()
    packed.unpersist()
    pack_sec = time.time() - t0

    # warm reader: term stats + block metadata + codegen
    bs.topk_term("w0000", 10).collect()
    bs.topk_or({"w0000": 1.0, "w0001": 1.0, "w0002": 1.0}, 10).collect()

    def p50(mk, n=3):
        runs = []
        for _ in range(n):
            t = time.time()
            mk().collect()
            runs.append(time.time() - t)
        return round(statistics.median(runs), 4)

    queries = {
        "q_term_topk": lambda: bs.topk_term("w0000", 10),
        "q_bool_or": lambda: bs.topk_or(
            {"w0000": 1.0, "w0001": 1.0, "w0002": 1.0}, 10
        ),
        "q_bool_and": lambda: bs.topk_and(["w0000", "w0001"], 10),
        "q_phrase": lambda: bs.topk_phrase(("w0000", "w0001"), 10),
    }
    timings = {}
    wand_stats = {}
    for name, mk in queries.items():
        timings[name] = p50(mk)
        # per-query pruning evidence — last_stats reflects the most recent
        # plan, so snapshot after each query (phrase cannot impact-prune;
        # recording only the final query's stats understates WAND pruning)
        wand_stats[name] = dict(bs.last_stats)

    # rank identity vs the exploded exact path at this scale
    exact = [
        (r["doc_id"], round(r["score"], 6))
        for r in IndexSearcher(idx, mode="lucene").search(TermQuery("w0000"), 10).collect()
    ]
    bs.topk_term("w0000", 10).collect()
    block = [
        (r["doc_id"], round(r["score"], 6))
        for r in bs.topk_term("w0000", 10).collect()
    ]

    # ---- impact-ordered layout (index sorting) ----
    # The generator corpus is iid: every 128-doc block's max (tf, norm)
    # impact ~= the global max, so the block-max bound can exclude nothing
    # and blocks_scored == blocks_total above is a property of the DATA,
    # not the engine (the skewed bench row shows 99%+ pruning when block
    # maxima vary). The production layout for homogeneous corpora is
    # index-time static-rank ordering (Lucene's IndexWriterConfig
    # .setIndexSort / our assign_doc_ids(order_col=...)): cluster short
    # (high-norm-score) docs into low doc_ids so block maxima are monotone
    # decreasing and WAND's threshold proves the tail non-competitive.
    from pyspark.sql import functions as F

    from lucenenet_spark.index.builder import assign_doc_ids

    t0 = time.time()
    ranked = (
        assign_doc_ids(
            corpus.drop("doc_id").withColumn("_len", F.length("text")),
            order_col="_len",
            num_partitions=cpus,
        )
        .drop("_len")
        .repartition(cpus, "doc_id")
        .persist()
    )
    ranked.count()
    idx2 = build_index(ranked, text_col="text", id_col="doc_id")
    idx2.postings.count()
    bs2 = BlockIndexSearcher(idx2)
    packed2 = bs2.blocks.persist()
    nb2 = packed2.count()
    bs2.blocks = (
        packed2.repartitionByRange(max(2, nb2 // 10_000 + 1), "field", "term", "block_id")
        .sortWithinPartitions("field", "term", "block_id")
        .cache()
    )
    bs2.blocks.count()
    packed2.unpersist()
    sorted_build_sec = time.time() - t0
    bs2.topk_term("w0000", 10).collect()  # warm reader
    sorted_timings = {}
    sorted_stats = {}
    for name, mk in {
        "q_term_topk": lambda: bs2.topk_term("w0000", 10),
        "q_bool_or": lambda: bs2.topk_or(
            {"w0000": 1.0, "w0001": 1.0, "w0002": 1.0}, 10
        ),
    }.items():
        sorted_timings[name] = p50(mk)
        sorted_stats[name] = dict(bs2.last_stats)
    # layout changes doc ids, not scores: top-10 score multiset identical
    sorted_scores = sorted(
        round(r["score"], 4) for r in bs2.topk_term("w0000", 10).collect()
    )
    base_scores = sorted(round(s, 4) for _, s in block)

    out = {
        "probe": "scale_decade",
        "n_docs": n_docs,
        "cpus": cpus,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "postings": n_postings,
        "pack_sec": round(pack_sec, 2),
        "blocks": n_blocks,
        "queries_p50_sec": timings,
        "wand_stats": wand_stats,
        "rank_identical_top10": exact == block,
        "wand_note": (
            "generator corpus is iid so every block's max impact ~= global "
            "max; blocks_scored==blocks_total is the data, not the engine "
            "(see impact_ordered section + bench q_wand_skew 99%+ pruning)"
        ),
        "impact_ordered": {
            "layout": "assign_doc_ids(order_col=length(text)) — index sorting",
            "build_pack_sec": round(sorted_build_sec, 2),
            "queries_p50_sec": sorted_timings,
            "wand_stats": {
                k: {
                    **v,
                    "pruned_pct": round(
                        100.0
                        * (1 - v["blocks_scored"] / max(1, v["blocks_total"])),
                        1,
                    ),
                }
                for k, v in sorted_stats.items()
            },
            "top10_score_multiset_identical": sorted_scores == base_scores,
        },
    }
    print(json.dumps(out))
    if record:
        with open(os.path.join(REPO, "BENCH_SCALE_r05.json"), "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
