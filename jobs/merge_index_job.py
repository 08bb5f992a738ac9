"""spark-submit entrypoint: merge saved indexes into one (IndexMergeTool).

The lucene-cli ``index merge`` analogue
(src/Lucene.Net.Misc/Misc/IndexMergeTool.cs: open the destination writer,
``AddIndexes(directories...)``, ``ForceMerge(1)``):

    spark-submit --py-files lucenenet_spark.zip jobs/merge_index_job.py \
        --output s3://bucket/index_merged/ \
        s3://bucket/index_a/ s3://bucket/index_b/ [...]

Local smoke:

    python jobs/merge_index_job.py --output /tmp/idx_merged /tmp/idx_a /tmp/idx_b

Doc ids are rebased by each prior index's docBase and collection
statistics re-aggregated (add_indexes), then the combined index is saved
term-range-partitioned — the save IS the ForceMerge(1): one coherent
sorted layout replaces the input segments. Prints one JSON line with the
merged stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge_saved_indexes(spark, output: str, sources: list[str], num_term_partitions: int = 8):
    """Load each saved index, concatenate with docBase rebasing, save the
    merged result to ``output``. Returns the merged InvertedIndex."""
    from lucenenet_spark.index.builder import InvertedIndex, add_indexes

    if not sources:
        raise ValueError("at least one source index is required")
    merged = add_indexes(*[InvertedIndex.load(spark, p) for p in sources])
    merged.save(output, num_term_partitions=num_term_partitions)
    return merged


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", required=True, help="destination index directory")
    ap.add_argument("--term-partitions", type=int, default=8)
    ap.add_argument("sources", nargs="+", help="source index directories")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lucenenet-index-merge").getOrCreate()
    merged = merge_saved_indexes(
        spark, args.output, args.sources, num_term_partitions=args.term_partitions
    )
    print(
        json.dumps(
            {
                "output": args.output,
                "sources": args.sources,
                "max_doc": merged.max_doc,
                "sum_ttf": merged.sum_ttf,
            }
        )
    )


if __name__ == "__main__":
    main()
