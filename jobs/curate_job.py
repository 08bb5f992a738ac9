"""spark-submit entrypoint: run the curation funnel over a corpus.

    spark-submit --py-files lucenenet_spark.zip jobs/curate_job.py \
        --input  s3://bucket/corpus/  --output s3://bucket/curated/ \
        [--min-words 50] [--lm-min-avg-logprob -3.45] \
        [--sample-fraction 0.8] [--salt curate]

Local smoke:

    python jobs/curate_job.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated

Applies functions/pipeline.curate (Gopher rules -> exact dedup
first-wins -> corpus-LM cut -> deterministic subsample), writes the
surviving documents (original columns + LM audit columns) as parquet,
and prints one JSON line with the per-stage-free funnel summary
(docs in/out, tokens kept).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--lm-min-avg-logprob", type=float, default=-3.45)
    ap.add_argument("--sample-fraction", type=float, default=0.8)
    ap.add_argument("--salt", default="curate")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pipeline import curate

    spark = SparkSession.builder.appName("lucenenet-curate").getOrCreate()
    docs = spark.read.parquet(args.input)
    survivors = curate(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        min_words=args.min_words,
        lm_min_avg_logprob=args.lm_min_avg_logprob,
        sample_fraction=args.sample_fraction,
        salt=args.salt,
    )
    out = docs.join(survivors, args.id_col)
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    summary = written.agg(
        F.count(F.lit(1)).alias("docs_out"), F.sum("n_tokens").alias("tokens_out")
    ).collect()[0]
    print(
        json.dumps(
            {
                "input": args.input,
                "output": args.output,
                "docs_in": docs.count(),
                "docs_out": summary["docs_out"],
                "tokens_out": int(summary["tokens_out"] or 0),
            }
        )
    )


if __name__ == "__main__":
    main()
