"""Round-5k: BooleanPerceptronClassifier (batch) + bloom-filtered save."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _mk_post(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, term string, tf long")


def _brute_perceptron(rows, labels, threshold2, epochs):
    """Pure-python epoch-synchronous twin of boolean_perceptron_weights."""
    docs = {}
    for d, t, tf in rows:
        docs.setdefault(d, {})[t] = docs.setdefault(d, {}).get(t, 0) + tf
    w: dict[str, int] = {}
    for _ in range(epochs):
        deltas: dict[str, int] = {}
        for d, y in labels.items():
            score = sum(w.get(t, 0) * tf for t, tf in docs.get(d, {}).items())
            pred = 2 * score >= threshold2
            if pred != y:
                for t, tf in docs.get(d, {}).items():
                    deltas[t] = deltas.get(t, 0) + (tf if y else -tf)
        for t, dv in deltas.items():
            w[t] = w.get(t, 0) + dv
    return w


def test_boolean_perceptron_matches_brute(spark):
    from lucenenet_spark.functions.classify import (
        boolean_perceptron_classify,
        boolean_perceptron_weights,
    )

    rows = [
        (0, "spark", 3), (0, "index", 1),
        (1, "spark", 1), (1, "bloom", 2),
        (2, "bloom", 4), (2, "filter", 1),
        (3, "filter", 2), (3, "index", 2),
        (4, "spark", 2), (4, "filter", 1),
    ]
    labels = {0: True, 1: True, 2: False, 3: False, 4: True}
    t2 = sum(tf for _, _, tf in rows)  # 2 * (sum/2), matches the gate
    post = _mk_post(spark, rows)
    lab = spark.createDataFrame(list(labels.items()), "doc_id long, y boolean")

    got = {
        r["term"]: r["w"]
        for r in boolean_perceptron_weights(post, lab, t2, epochs=3).collect()
    }
    want = _brute_perceptron(rows, labels, t2, epochs=3)
    assert got == {t: w for t, w in want.items()}

    preds = {
        r["doc_id"]: r["pred"]
        for r in boolean_perceptron_classify(
            post, lab.select("doc_id"), boolean_perceptron_weights(post, lab, t2, 3), t2
        ).collect()
    }
    for d in labels:
        score = sum(
            want.get(t, 0) * tf for dd, t, tf in rows if dd == d
        )
        assert preds[d] == (2 * score >= t2)


def test_boolean_perceptron_doc_without_terms(spark):
    """Docs absent from postings score 0 and still get a prediction."""
    from lucenenet_spark.functions.classify import (
        boolean_perceptron_classify,
        boolean_perceptron_weights,
    )

    post = _mk_post(spark, [(0, "a", 5)])
    lab = spark.createDataFrame([(0, True), (1, False)], "doc_id long, y boolean")
    w = boolean_perceptron_weights(post, lab, 4, epochs=1)
    out = {
        r["doc_id"]: r["pred"]
        for r in boolean_perceptron_classify(
            post, lab.select("doc_id"), w, 4
        ).collect()
    }
    assert out[1] is False  # no terms -> score 0 -> 0 >= 4 false
    assert out[0] is True  # w[a]=5 from epoch-1 update, 2*25 >= 4


def test_bloom_save_layout(spark, tmp_path):
    """Bloom-enabled save produces byte-larger postings files and an
    identical loaded index. The vocabulary must exceed the 1 MB parquet
    dictionary page (~120k distinct terms here) or parquet-mr keeps the
    dictionary and skips the bloom filter entirely."""
    from lucenenet_spark.index.builder import InvertedIndex, build_index

    docs = spark.createDataFrame(
        [(i, " ".join(f"uniqterm{i}x{j}" for j in range(6))) for i in range(20000)],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    plain, bloom = str(tmp_path / "plain"), str(tmp_path / "bloom")
    idx.save(plain, num_term_partitions=1)
    idx.save(bloom, num_term_partitions=1, bloom_filter_terms=True, term_ndv=1 << 12)

    def _bytes(p):
        d = os.path.join(p, "postings")
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert _bytes(bloom) > _bytes(plain)

    a = InvertedIndex.load(spark, plain)
    b = InvertedIndex.load(spark, bloom)
    cols = ["term", "doc_id", "tf"]
    assert sorted(map(tuple, a.postings.select(*cols).collect())) == sorted(
        map(tuple, b.postings.select(*cols).collect())
    )


def test_bloom_mode_rejects_nothing(spark, tmp_path):
    """A term present in the corpus is always found through the bloom
    layout (bloom filters may false-positive, never false-negative)."""
    from lucenenet_spark.index.builder import InvertedIndex, build_index

    docs = spark.createDataFrame(
        [(i, f"needle{i} haystack common") for i in range(32)],
        "doc_id long, text string",
    )
    idx = build_index(docs)
    p = str(tmp_path / "idx")
    idx.save(p, bloom_filter_terms=True, term_ndv=1 << 10)
    loaded = InvertedIndex.load(spark, p)
    hits = loaded.postings.filter(F.col("term") == "needle7").count()
    assert hits == 1
