"""1M-doc block-pack probe: index build wall vs pack wall (columnar JVM
pack vs the round-3 Python parity pack). Usage:
    python tools/pack_probe.py [n_docs] [cpus] [modes...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
modes = sys.argv[3:] or ["columnar"]

from pyspark.sql import SparkSession

from lucenenet_spark.testgen import corpus_parquet

path = corpus_parquet(n_docs)
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.index.blocks import pack_postings
from lucenenet_spark.index.smallfloat import bm25_norm_cache

# the generator writes ONE parquet row group, which split planning cannot
# divide: without an explicit spread the whole build+pack pipeline runs in
# a single task (real corpora arrive as many files/row groups)
corpus = spark.read.parquet(path).repartition(cpus * 2)
t0 = time.time()
idx = build_index(corpus, text_col="text", id_col="doc_id")
idx.postings.count()
build_sec = time.time() - t0

cache = bm25_norm_cache(idx.avgdl_for(idx.default_field), 1.2, 0.75)
out = {"n_docs": n_docs, "cpus": cpus, "build_sec": round(build_sec, 1)}
for mode in modes:
    t0 = time.time()
    blocks = pack_postings(idx.postings, norm_cache=cache, mode=mode)
    nb = blocks.count()
    sec = time.time() - t0
    out[f"pack_{mode}_sec"] = round(sec, 1)
    out[f"pack_{mode}_blocks"] = nb
    out[f"pack_{mode}_docs_per_sec"] = round(n_docs / sec, 1)
print(json.dumps(out))
