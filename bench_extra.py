"""Optimization-round instrumentation (guide §1): per-phase isolation of
the heavy bench rows with noop sinks + job descriptions, separate from the
FROZEN bench.py. Not part of the driver's measurement.

Usage: SPARK_GRAFT_SF_DIR=... python bench_extra.py [phase ...]
Phases: build pack minhash queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    phases = set(sys.argv[1:]) or {"build", "pack", "minhash", "queries"}

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lucenenet_spark import IndexSearcher, build_index
    from lucenenet_spark.functions import dedup as fdedup
    from lucenenet_spark.index.blocks import pack_postings
    from lucenenet_spark.index.smallfloat import bm25_norm_cache
    from lucenenet_spark.search.block_searcher import BlockIndexSearcher

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lucenenet_spark-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(min(cpus, 16), "doc_id")
        .persist()
    )
    n_docs = docs.count()
    out: dict[str, float] = {"n_docs": n_docs}

    def timed(name, fn, reps=3):
        fn()  # warm
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            runs.append(time.time() - t0)
        out[name] = round(min(runs), 4)

    if "build" in phases:
        # phase 1: tokenize+invert only (the mapInArrow pass), noop sink,
        # fresh plan each run (no persist) so we time the computation
        from lucenenet_spark.index.builder import _inverter_map, POSTINGS_SCHEMA
        from lucenenet_spark.analysis.analyzers import StandardAnalyzer

        def invert_only():
            sc.setJobDescription("build: tokenize+invert (noop)")
            p = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text").mapInArrow(
                _inverter_map({"text": StandardAnalyzer()}, "doc_id", True, False),
                POSTINGS_SCHEMA,
            )
            noop(p)

        timed("build_invert_only", invert_only)

        # phase 2: full build_index sequence as bench does it
        def full_build():
            sc.setJobDescription("build: full build_index + 3 counts")
            idx = build_index(docs, text_col="text", id_col="doc_id").cache()
            idx.postings.count()
            idx.doclens.count()
            idx.term_stats.count()
            idx.unpersist()

        timed("build_full", full_build)

        # phase 2b: what does the internal totals collect cost on its own?
        idx0 = build_index(docs).cache()
        idx0.postings.count()

        def doclens_only():
            sc.setJobDescription("build: doclens from cached postings (noop)")
            noop(idx0.doclens)

        timed("build_doclens_from_cached", doclens_only)

        def term_stats_only():
            sc.setJobDescription("build: term_stats from cached postings (noop)")
            noop(idx0.term_stats)

        timed("build_term_stats_from_cached", term_stats_only)
        idx0.unpersist()

    if "pack" in phases or "queries" in phases:
        idx = build_index(docs).cache()
        n_postings = idx.postings.count()
        idx.doclens.count()
        idx.term_stats.count()
        out["n_postings"] = n_postings

    if "pack" in phases:
        cache = bm25_norm_cache(idx.avgdl_for("text"), 1.2, 0.75)

        def pack_only():
            sc.setJobDescription("pack: pack_postings (noop)")
            noop(pack_postings(idx.postings, norm_cache=cache))

        timed("pack_only", pack_only)

        def pack_bench_shape():
            sc.setJobDescription("pack: bench shape (persist+range+cache)")
            bs = BlockIndexSearcher(idx)
            nb_est = max(2, n_postings // (128 * 10_000) + 1)
            packed_once = bs.blocks.persist()
            packed_once.count()
            bs.blocks = (
                packed_once.repartitionByRange(nb_est, "field", "term", "block_id")
                .sortWithinPartitions("field", "term", "block_id")
                .cache()
            )
            bs.blocks.count()
            packed_once.unpersist()
            bs.blocks.unpersist()

        timed("pack_bench_shape", pack_bench_shape)

    if "minhash" in phases:
        def mk():
            return fdedup.minhash_lsh_pairs(
                fdedup.capped_shingles(docs, n=3).withColumnRenamed("shingle", "term")
            )

        # warm: materializes the tracked persisted intermediates
        sc.setJobDescription("minhash: warm (materialize tracked caches)")
        t0 = time.time()
        mk().collect()
        out["minhash_cold"] = round(time.time() - t0, 4)

        def whole():
            sc.setJobDescription("minhash: full pipeline (warm caches)")
            mk().collect()

        timed("minhash_warm", whole)

        # sub-phases on warm caches
        sh = fdedup.capped_shingles(docs, n=3).withColumnRenamed("shingle", "term")

        def shingle_side():
            sc.setJobDescription("minhash: capped_shingles only (noop)")
            noop(sh)

        timed("minhash_capped_shingles", shingle_side)

        def sig_side():
            sc.setJobDescription("minhash: signatures only (noop)")
            noop(fdedup.minhash_signatures(sh))

        timed("minhash_signatures", sig_side)
        fdedup.release_intermediates()

    if "queries" in phases:
        bs = BlockIndexSearcher(idx)
        nb_est = max(2, n_postings // (128 * 10_000) + 1)
        packed_once = bs.blocks.persist()
        packed_once.count()
        bs.blocks = (
            packed_once.repartitionByRange(nb_est, "field", "term", "block_id")
            .sortWithinPartitions("field", "term", "block_id")
            .cache()
        )
        bs.blocks.count()
        packed_once.unpersist()
        searcher = IndexSearcher(idx, mode="lucene")
        from lucenenet_spark.search.queries import (
            BooleanQuery, Occur, PhraseQuery, TermQuery,
        )

        searcher.search(TermQuery("vector"), 10).collect()
        bs.topk_or({"vector": 1.0, "merge": 1.0, "key": 1.0, "agg": 1.0, "scan": 1.0}, 10).collect()

        timed("q_term_topk", lambda: bs.topk_term("vector", 10).collect())
        timed("q_bool_or", lambda: bs.topk_or({"key": 1.0, "agg": 1.0, "scan": 1.0}, 10).collect())
        out["q_bool_or_stats"] = dict(bs.last_stats)
        timed("q_bool_and", lambda: bs.topk_and(["vector", "merge"], 10).collect())
        out["q_bool_and_stats"] = dict(bs.last_stats)
        timed("q_phrase", lambda: bs.topk_phrase(("key", "agg"), 10).collect())
        timed("q_or_exploded", lambda: searcher.search(
            BooleanQuery.of(
                (TermQuery("key"), Occur.SHOULD),
                (TermQuery("agg"), Occur.SHOULD),
                (TermQuery("scan"), Occur.SHOULD),
            ), 10).collect())
        timed("q_and_exploded", lambda: searcher.search(
            BooleanQuery.of(
                (TermQuery("vector"), Occur.MUST), (TermQuery("merge"), Occur.MUST)
            ), 10).collect())
        timed("q_phrase_exploded", lambda: searcher.search(
            PhraseQuery(terms=("key", "agg")), 10).collect())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
