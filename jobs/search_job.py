"""spark-submit entrypoint: serve queries against a built index.

    spark-submit --py-files lucenenet_spark.zip jobs/search_job.py \
        --index s3://bucket/index_v1/index --query '+quick +fox' --k 10

Prints one JSON line per query: {"query": ..., "hits": [[doc_id, score]...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="index dir (from build_index_job)")
    ap.add_argument("--query", action="append", required=True, help="classic-syntax query (repeatable)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="lucene", choices=["lucene", "double"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucenenet_spark.index.builder import InvertedIndex
    from lucenenet_spark.search.searcher import IndexSearcher

    spark = SparkSession.builder.appName("lucenenet-spark-search").getOrCreate()
    idx = InvertedIndex.load(spark, args.index).cache()
    searcher = IndexSearcher(idx, mode=args.mode)
    for q in args.query:
        rows = searcher.search_text(q, k=args.k).collect()
        print(
            json.dumps(
                {"query": q, "hits": [[int(r["doc_id"]), float(r["score"])] for r in rows]}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
