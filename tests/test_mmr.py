"""MMR diversification invariants (functions/mmr.py)."""

import pytest
from pyspark.sql import SparkSession

from lucenenet_spark.functions.mmr import candidate_sims, mmr_rerank, mmr_topk

SF = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield s


def test_lambda_ten_is_pure_relevance(spark):
    from lucenenet_spark.functions.similarity import cosine_topk

    emb = spark.read.parquet(SF)
    cand = [(r["vec_id"], r["cos_q"]) for r in cosine_topk(emb, 0, k=10).collect()]
    out = mmr_rerank(emb, cand, k=5, lambda_tenths=10)
    # (10-L)=0: penalty vanishes, selection == relevance order
    assert [v for _, v, _ in out] == [c[0] for c in cand[:5]]
    assert all(m == 10 * dict(cand)[v] for _, v, m in out)


def test_diversification_penalizes_near_duplicates(spark):
    # q=[1,0]; a ~ q and b ~ a (near-dups), c orthogonal-ish but relevant
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),   # rel high, very close to 0
        (2, [0.5, 0.87]),    # rel lower, far from 0 and 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cand = [(0, 10000), (1, 9902), (2, 5000)]
    out = mmr_rerank(emb, cand, k=3, lambda_tenths=5)
    picks = [v for _, v, _ in out]
    # step1 pure relevance -> 0; step2 must prefer the diverse 2 over the
    # near-duplicate 1 at lambda=0.5
    assert picks[0] == 0
    assert picks[1] == 2
    assert picks[2] == 1


def test_steps_and_uniqueness(spark):
    emb = spark.read.parquet(SF)
    out = mmr_topk(spark, emb, 0, n_candidates=20, k=5).collect()
    assert [r["step"] for r in out] == [1, 2, 3, 4, 5]
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 5
    assert ids[0] == 0  # query vector itself is the most relevant


def test_candidate_sims_symmetric_and_bounded(spark):
    emb = spark.read.parquet(SF)
    ids = [0, 1, 2, 3]
    rows = candidate_sims(emb, ids).collect()
    assert len(rows) == len(ids) * (len(ids) - 1)
    sims = {(r["id_a"], r["id_b"]): r["sim_q"] for r in rows}
    for (a, b), s in sims.items():
        assert sims[(b, a)] == s
        assert -10000 <= s <= 10000
