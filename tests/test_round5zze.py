"""Round-5 part-zze twins: 11-point interpolated precision and
R-precision."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.quality import interp_precision_11pt, r_precision
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

def _engine(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    return IndexSearcher(idx, mode="double")


def _replica(run_rel, r_total):
    relcnt, pts = 0, []
    for i, rel in enumerate(run_rel, start=1):
        relcnt += int(rel)
        pts.append((relcnt, math.floor(relcnt / i * 1e9 + 0.5)))
    out = {}
    for lvl in range(11):
        qual = [p for rc, p in pts if rc * 10 >= lvl * r_total]
        out[lvl] = max(qual) if qual else 0
    return out


def test_interp_curve_is_monotone_nonincreasing(spark):
    texts = ["hit hit f%d" % i if i % 2 == 0 else "hit f%d x" % i for i in range(12)]
    s = _engine(spark, texts)
    rows = sorted(interp_precision_11pt(s, "hit", k=12).collect(), key=lambda r: r["level10"])
    vals = [r["p_interp_q9"] for r in rows]
    assert len(vals) == 11
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_interp_replica(spark):
    texts = []
    for i in range(15):
        w = ["f%d" % j for j in range(i % 3 + 1)]
        if i % 4 != 3:
            w += ["hit"] * (2 if i % 2 == 0 else 1)
        texts.append(" ".join(w))
    s = _engine(spark, texts)
    k = 15
    rows = {r["level10"]: r for r in interp_precision_11pt(s, "hit", k=k).collect()}
    run = (
        s.scored(TermQuery("hit"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    rel = {i for i in range(15) if i % 4 != 3 and (2 if i % 2 == 0 else 1) >= 2}
    r_total = len(rel)
    want = _replica([r["doc_id"] in rel for r in run], r_total)
    for lvl in range(11):
        assert rows[lvl]["p_interp_q9"] == want[lvl]
    # a deep run covers R, so the recall-1.0 point is populated
    assert rows[10]["p_interp_q9"] > 0


def test_interp_perfect_ranking_is_flat_one(spark):
    # the only matches are the relevant docs and they fill the top ranks
    texts = ["hit hit a"] * 4 + ["other b c"] * 6
    s = _engine(spark, texts)
    rows = {r["level10"]: r for r in interp_precision_11pt(s, "hit", k=10).collect()}
    for lvl in range(11):
        assert rows[lvl]["p_interp_q9"] == 10 ** 9  # precision 1.0 everywhere


def test_interp_validates_k(spark):
    s = _engine(spark, ["x y"])
    with pytest.raises(ValueError):
        interp_precision_11pt(s, "x", k=0)


# -------------------------------------------------------------- r-precision
def test_r_precision_perfect(spark):
    texts = ["hit hit a"] * 3 + ["zz b c"] * 5
    s = _engine(spark, texts)
    r = r_precision(s, "hit").collect()[0]
    assert (r["r_total"], r["rel_at_r"]) == (3, 3)


def test_r_precision_mixed_replica(spark):
    texts = []
    for i in range(12):
        w = ["f%d" % j for j in range(i % 2 + 1)]
        if i % 3 != 2:
            w += ["hit"] * (i % 2 + 1)
        texts.append(" ".join(w))
    s = _engine(spark, texts)
    r = r_precision(s, "hit").collect()[0]
    rel = {i for i in range(12) if i % 3 != 2 and i % 2 + 1 >= 2}
    run = (
        s.scored(TermQuery("hit"))
        .select("doc_id", F.floor(F.col("score") * 10000.0 + 0.5).cast("long").alias("q"))
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .limit(len(rel))
        .collect()
    )
    assert r["r_total"] == len(rel)
    assert r["rel_at_r"] == sum(1 for x in run if x["doc_id"] in rel)
