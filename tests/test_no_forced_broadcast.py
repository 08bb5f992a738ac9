"""Round-3 scale-hazard regression: the dedup/ANN paths must not FORCE
broadcasts of corpus-sized frames (heavy-shingle set, oversized LSH
buckets, ANN candidate set). With spark.sql.autoBroadcastJoinThreshold=-1
Spark can never choose a broadcast join on its own, so a forced
F.broadcast is the only way one could appear — results must be identical
either way, proving the plans run (and stay correct) as shuffle joins."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions import dedup as fdedup
from lucenenet_spark.functions import similarity as fsim


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _docs(spark, n=300):
    rows = [
        (d, " ".join(f"t{(d * 7 + i) % 40}" for i in range(25)) + (" dupmark" * (d % 3)))
        for d in range(n)
    ]
    # inject near-dup pairs
    rows += [(1000 + d, rows[d][1]) for d in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_lsh_identical_without_broadcast(no_broadcast):
    spark = no_broadcast
    docs = _docs(spark)
    sh = fdedup.capped_shingles(docs, n=3, df_cap=50).withColumnRenamed("shingle", "term")
    pairs = sorted(
        (r["doc_a"], r["doc_b"])
        for r in fdedup.minhash_lsh_pairs(sh, n_hashes=32, bands=8).collect()
    )
    assert "BroadcastExchange" not in fdedup.minhash_lsh_pairs(
        sh, n_hashes=32, bands=8
    )._jdf.queryExecution().executedPlan().toString()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    pairs_bc = sorted(
        (r["doc_a"], r["doc_b"])
        for r in fdedup.minhash_lsh_pairs(sh, n_hashes=32, bands=8).collect()
    )
    assert pairs == pairs_bc and len(pairs) >= 10


def test_ann_lsh_identical_without_broadcast(no_broadcast):
    spark = no_broadcast
    emb = spark.createDataFrame(
        [(v, [((v * 13 + i * 7) % 19 - 9) / 9.0 for i in range(16)]) for v in range(400)],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["vec_id"], r["cos_q"])
        for r in fsim.ann_lsh_topk(
            emb, 5, k=10, n_planes=6, dim=16, quantized=True
        ).collect()
    ]
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    got_bc = [
        (r["vec_id"], r["cos_q"])
        for r in fsim.ann_lsh_topk(
            emb, 5, k=10, n_planes=6, dim=16, quantized=True
        ).collect()
    ]
    assert got == got_bc and len(got) == 10
