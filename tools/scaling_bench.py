"""Scaling-efficiency benchmark: the same index-build + query job at two
parallelism levels (local[8] vs local[32]) on identical input — the sandbox
proxy for the north rule's "N vs 4N executors, efficiency >= 0.8".

Each measurement runs in a fresh subprocess (own JVM) so the two
configurations don't share a block manager or JIT state. Results are
appended to BENCH.md and printed as JSON.

Usage: python tools/scaling_bench.py [n_docs] [cpus ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
n_docs = %(n_docs)d
cpus = %(cpus)d
corpus_path = %(corpus_path)r

from pyspark.sql import SparkSession
from lucenenet_spark import IndexSearcher, build_index
from lucenenet_spark.queryparser import QueryParser
from lucenenet_spark.testgen import REFERENCE_QUERIES

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"scaling-bench-{cpus}")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

corpus = spark.read.parquet(corpus_path).repartition(cpus * 2, "doc_id").persist()
corpus.count()  # warm the cache: generation/read excluded from the timed build

t0 = time.time()
idx = build_index(corpus, text_col="text", id_col="doc_id")
idx.postings.count(); idx.doclens.count(); idx.term_stats.count()
build_sec = time.time() - t0

searcher = IndexSearcher(idx, mode="lucene")
parser = QueryParser()
lat = []
t_all0 = time.time()
for qid, qs in REFERENCE_QUERIES:
    t0 = time.time()
    searcher.search(parser.parse(qs), 10).collect()
    lat.append(time.time() - t0)
query_wall = time.time() - t_all0
lat.sort()
out = {
    "cpus": cpus,
    "n_docs": n_docs,
    "build_sec": round(build_sec, 3),
    "docs_per_sec": round(n_docs / build_sec, 1),
    "query_wall_sec": round(query_wall, 3),
    "queries_per_sec": round(len(lat) / query_wall, 3),
    "query_p50_sec": round(lat[len(lat) // 2], 4),
    "query_p95_sec": round(lat[int(len(lat) * 0.95) - 1], 4),
}
print("CHILD_RESULT " + json.dumps(out))
spark.stop()
"""


def run_child(n_docs: int, cpus: int, corpus_path: str) -> dict:
    code = CHILD % {"repo": REPO, "n_docs": n_docs, "cpus": cpus, "corpus_path": corpus_path}
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def _host_capacity_probe(cpu_list: list[int]) -> dict[int, float]:
    """Pure-Python CPU burn at each parallelism level: measures how many
    effective cores the (virtualized) host actually delivers, so the
    report can separate engine scaling from hypervisor throttling."""
    import multiprocessing as mp
    import time as _t

    def _burn(n):
        x = 0
        for i in range(n):
            x += i * i
        return x

    N = 3_000_000
    t0 = _t.time()
    _burn(N)
    single = _t.time() - t0
    out = {}
    for procs in cpu_list:
        with mp.Pool(procs) as p:
            p.map(_burn, [N // 10] * procs)  # warm the pool
            t0 = _t.time()
            p.map(_burn, [N] * procs)
            wall = _t.time() - t0
        out[procs] = round(procs * single / wall, 2)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpu_list = [int(x) for x in sys.argv[2:]] or [2, 8]
    from lucenenet_spark.testgen import corpus_parquet

    corpus_path = os.path.abspath(corpus_parquet(n_docs, os.path.join(REPO, ".bench_cache")))
    capacity = _host_capacity_probe(cpu_list)
    print(json.dumps({"host_effective_cores": capacity}))
    results = [run_child(n_docs, c, corpus_path) for c in cpu_list]
    for r in results:
        print(json.dumps(r))

    summary = {"n_docs": n_docs, "runs": results, "host_effective_cores": capacity}
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
        cores_ratio = hi["cpus"] / lo["cpus"]
        summary["build_speedup"] = round(ratio, 3)
        summary["scaling_efficiency"] = round(ratio / cores_ratio, 3)
        q_ratio = hi["queries_per_sec"] / lo["queries_per_sec"]
        summary["query_speedup"] = round(q_ratio, 3)
    print(json.dumps(summary))

    lines = [
        "",
        f"## Measured scaling (n_docs={n_docs}, seed=42, generator=FIXTURES.md §1)",
        "",
        "| cpus | build sec | build docs/sec | query p50 s | query p95 s | queries/s |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['cpus']} | {r['build_sec']} | {r['docs_per_sec']} | "
            f"{r['query_p50_sec']} | {r['query_p95_sec']} | {r['queries_per_sec']} |"
        )
    if "scaling_efficiency" in summary:
        cr = results[-1]["cpus"] // results[0]["cpus"]
        hw = capacity.get(results[-1]["cpus"], None)
        hw_lo = capacity.get(results[0]["cpus"], None)
        hw_ceiling = round(hw / hw_lo / cr, 3) if hw and hw_lo else None
        lines.append("")
        lines.append(
            f"Build speedup {summary['build_speedup']}x over {cr}x cores -> "
            f"**scaling efficiency {summary['scaling_efficiency']}** "
            f"(north-rule target >= 0.8 per-core-normalized is "
            f"{'met' if summary['scaling_efficiency'] >= 0.8 else 'NOT met'}; "
            f"local-mode proxy for N vs 4N executors)."
        )
        lines.append(
            f"Host capacity probe (pure-Python multiprocessing burn): "
            f"effective parallel speedup {capacity} — the virtualized host's own "
            f"ceiling for this cores ratio is {hw_ceiling}; engine efficiency "
            f"should be read relative to that ceiling."
        )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
