"""Benchmark harness: index build + headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <dir>, "docs_per_sec": ...}

Environment:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_REPEATS       (default 3; reports median per query)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from pyspark.sql import SparkSession

    from lucenenet_spark import IndexSearcher, build_index
    from lucenenet_spark.functions import dedup as fdedup
    from lucenenet_spark.functions import similarity as fsim
    from lucenenet_spark.search.queries import (
        BooleanQuery,
        Occur,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("lucenenet_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    timings: dict[str, float] = {}

    # ---- index build (docs/sec headline) ----
    t0 = time.time()
    idx = build_index(docs, text_col="text", id_col="doc_id").cache()
    # materialize all index tables
    n_postings = idx.postings.count()
    idx.doclens.count()
    idx.term_stats.count()
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 4)

    searcher = IndexSearcher(idx, mode="lucene")

    queries = {
        "q_term_topk": lambda: searcher.search(TermQuery("vector"), 10),
        "q_bool_and": lambda: searcher.search(
            BooleanQuery.of((TermQuery("vector"), Occur.MUST), (TermQuery("merge"), Occur.MUST)),
            10,
        ),
        "q_bool_or": lambda: searcher.search(
            BooleanQuery.of(
                (TermQuery("key"), Occur.SHOULD),
                (TermQuery("agg"), Occur.SHOULD),
                (TermQuery("scan"), Occur.SHOULD),
            ),
            10,
        ),
        "q_bool_not": lambda: searcher.search(
            BooleanQuery.of((TermQuery("table"), Occur.MUST), (TermQuery("dup"), Occur.MUST_NOT)),
            10,
        ),
        "q_phrase": lambda: searcher.search(PhraseQuery(terms=("key", "agg")), 10),
        "q_prefix": lambda: searcher.docset(PrefixQuery("du")),
        "q_minhash_lsh": lambda: fdedup.minhash_lsh_pairs(
            fdedup.capped_shingles(docs, n=3).withColumnRenamed("shingle", "term")
        ),
        "q_cosine_topk": lambda: _cosine_arrays(),
    }

    def _cosine_arrays():
        from pyspark.sql import functions as F

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
        ]
        return fsim.cosine_topk_arrays_q(emb, qvec, 10)

    for name, mk in queries.items():
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            mk().collect()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 4)

    # ---- packed-block serving path (production layout; BMW pruning) ----
    from lucenenet_spark.search.block_searcher import BlockIndexSearcher

    t0 = time.time()
    bsearcher = BlockIndexSearcher(idx)
    bsearcher.blocks = bsearcher.blocks.cache()
    n_blocks = bsearcher.blocks.count()
    timings["block_pack"] = round(time.time() - t0, 4)
    wand_stats = {}
    for name, mk in {
        "q_block_term": lambda: bsearcher.topk_term("vector", 10),
        "q_block_or": lambda: bsearcher.topk_or(
            {"key": 1.0, "agg": 1.0, "scan": 1.0}, 10
        ),
        "q_block_and": lambda: bsearcher.topk_and(["vector", "merge"], 10),
    }.items():
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            mk().collect()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 4)
        wand_stats[name] = dict(bsearcher.last_stats)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "index_build+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / build_sec, 2),
        "postings": n_postings,
        "postings_per_sec": round(n_postings / build_sec, 2),
        "blocks": n_blocks,
        "wand_stats": wand_stats,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
