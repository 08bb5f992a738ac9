"""Sampling + decontamination pipeline-operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.decontam import decontaminate, ngram_overlap_report
from lucenenet_spark.functions.sampling import (
    deterministic_sample,
    sample_hash,
    split_train_holdout,
    stratified_sample,
)


def _py_hash(id_val, salt="") -> int:
    return int(hashlib.md5(f"{salt}#{id_val}".encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else "de") for i in range(2000)],
        "doc_id long, lang string",
    )


def test_sample_hash_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = df.select("doc_id", sample_hash(F.col("doc_id"), "s").alias("h")).collect()
    for r in got:
        assert r["h"] == _py_hash(r["doc_id"], "s")


def test_deterministic_sample_fraction_and_stability(ids_df):
    out1 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3, salt="a").collect()}
    out2 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3, salt="a").collect()}
    assert out1 == out2  # rerun-stable
    assert 0.2 < len(out1) / 2000 < 0.4  # ~30%
    # expected membership is a pure function of the hash
    expect = {i for i in range(2000) if _py_hash(i, "a") % 1_000_000 < 300_000}
    assert out1 == expect
    # different salt -> different (independent) sample
    out3 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.3, salt="b").collect()}
    assert out3 != out1


def test_sample_nesting_property(ids_df):
    """fraction f1 < f2 with the same salt => sample(f1) ⊆ sample(f2)."""
    s1 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.1, salt="n").collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(ids_df, 0.5, salt="n").collect()}
    assert s1 <= s2


def test_stratified_sample_rates_and_default(ids_df):
    out = stratified_sample(
        ids_df, "lang", {"en": 0.9}, default_fraction=0.1, salt="x"
    ).collect()
    en = sum(1 for r in out if r["lang"] == "en")
    de = sum(1 for r in out if r["lang"] == "de")
    n_en = 2000 // 3 + 1
    n_de = 2000 - n_en
    assert 0.8 < en / n_en <= 1.0
    assert 0.03 < de / n_de < 0.25
    for r in out:
        limit = 900_000 if r["lang"] == "en" else 100_000
        assert _py_hash(r["doc_id"], "x") % 1_000_000 < limit


def test_fraction_validation(ids_df):
    with pytest.raises(ValueError):
        deterministic_sample(ids_df, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(ids_df, "lang", {"en": -0.1})


def test_split_train_holdout_disjoint_and_stable(ids_df, spark):
    train, hold = split_train_holdout(ids_df, 0.2, salt="sp")
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h) and t | h == set(range(2000))
    # growth stability: adding rows never moves an existing row's split
    bigger = spark.createDataFrame(
        [(i, "en") for i in range(3000)], "doc_id long, lang string"
    )
    _, hold2 = split_train_holdout(bigger, 0.2, salt="sp")
    h2 = {r["doc_id"] for r in hold2.collect()}
    assert h == {x for x in h2 if x < 2000}


# ----------------------------------------------------------------------
# decontamination
# ----------------------------------------------------------------------

W = [f"w{i:03d}" for i in range(100)]


@pytest.fixture(scope="module")
def contam_dfs(spark):
    docs = [
        (0, " ".join(W[0:30])),          # contains probe A's 13-grams
        (1, " ".join(W[5:35])),          # overlaps probe A partially
        (2, " ".join(W[50:90])),         # clean
        (3, " ".join(W[0:12])),          # too short for any 13-gram
    ]
    probes = [(100, " ".join(W[0:20]))]  # probe A: tokens w000..w019
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(probes, "probe_id long, text string"),
    )


def test_overlap_report_counts(contam_dfs):
    docs, probes = contam_dfs
    rep = {
        (r["doc_id"], r["probe_id"]): (r["overlap"], r["doc_grams"])
        for r in ngram_overlap_report(docs, probes, n=13).collect()
    }
    # probe has tokens 0..19 -> 8 distinct 13-grams (i=0..7)
    # doc0 (tokens 0..29) contains all 8; doc0 has 18 grams total
    assert rep[(0, 100)] == (8, 18)
    # doc1 (tokens 5..34) shares grams starting at 5,6,7 -> 3
    assert rep[(1, 100)] == (3, 18)
    assert (2, 100) not in rep and (3, 100) not in rep


def test_overlap_exact_mode_agrees(contam_dfs):
    docs, probes = contam_dfs
    a = sorted(map(tuple, ngram_overlap_report(docs, probes, n=13).collect()))
    b = sorted(map(tuple, ngram_overlap_report(docs, probes, n=13, exact=True).collect()))
    assert a == b


def test_decontaminate_drops_contaminated(contam_dfs):
    docs, probes = contam_dfs
    kept = {r["doc_id"] for r in decontaminate(docs, probes, n=13).collect()}
    assert kept == {2, 3}
    # min_overlap policy: requiring >3 shared grams spares doc1
    kept2 = {r["doc_id"] for r in decontaminate(docs, probes, n=13, min_overlap=4).collect()}
    assert kept2 == {1, 2, 3}


# ----------------------------------------------------------------------
# embedding near-dup
# ----------------------------------------------------------------------

def test_embedding_near_duplicates(spark):
    from lucenenet_spark.functions.dedup import embedding_near_duplicates

    dim = 64
    base = [float((i * 37 % 19) - 9) for i in range(dim)]
    near = list(base)
    near[0] += 0.01                      # cosine ~ 1 with base
    anti = [-x for x in base]            # cosine -1
    other = [float((i * 53 % 23) - 11) for i in range(dim)]
    rows = [(0, base), (1, near), (2, anti), (3, other)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = {
        (r["id_a"], r["id_b"]): r["cos_q"]
        for r in embedding_near_duplicates(emb, 0.95, dim=dim).collect()
    }
    # identical-direction pair always collides in every band and passes
    assert (0, 1) in out and out[(0, 1)] >= 9990
    # opposite/unrelated vectors never reach the threshold
    assert all(k == (0, 1) for k in out)

    # ids come back ordered, and a tighter threshold can only shrink output
    loose = embedding_near_duplicates(emb, 0.10, dim=dim).collect()
    tight = embedding_near_duplicates(emb, 0.99, dim=dim).collect()
    assert len(tight) <= len(loose)
    for r in loose:
        assert r["id_a"] < r["id_b"]


def test_embedding_near_duplicates_bucket_cap(spark):
    from lucenenet_spark.functions.dedup import embedding_near_duplicates

    dim = 8
    v = [1.0] * dim
    emb = spark.createDataFrame(
        [(i, v) for i in range(6)], "vec_id long, embedding array<double>"
    )
    # all 6 identical vectors share every bucket: cap 5 drops the cluster
    assert embedding_near_duplicates(
        emb, 0.9, dim=dim, max_bucket_size=5
    ).count() == 0
    # without the cap the full 15-pair clique appears
    assert embedding_near_duplicates(
        emb, 0.9, dim=dim, max_bucket_size=None
    ).count() == 15


def test_embedding_near_duplicates_validation(spark):
    from lucenenet_spark.functions.dedup import embedding_near_duplicates

    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        embedding_near_duplicates(emb, 0.5, n_planes=16, n_bands=5)
