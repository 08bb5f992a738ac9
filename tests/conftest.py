import os
import random

import pytest
from pyspark.sql import SparkSession

os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("lucenenet_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


def make_corpus(n: int = 200, seed: int = 42) -> dict[int, str]:
    """Deterministic synthetic webtext corpus (FIXTURES.md §1 shape)."""
    rng = random.Random(seed)
    stop = (
        "a an and are as at be but by for if in into is it no not of on or "
        "such that the their then there these they this to was will with"
    ).split()
    docs = {}
    for d in range(n):
        length = max(5, min(2000, int(rng.lognormvariate(4.0, 0.6))))
        words = []
        for _ in range(length):
            if rng.random() < 0.25:
                words.append(rng.choice(stop))
            else:
                # Zipf-ish draw over w0000..w9999
                z = int(rng.paretovariate(1.1)) - 1
                words.append(f"w{min(z, 9999):04d}")
        if d % 10 == 0:
            words.append("Quick")
            words.append("FOX,")
        docs[d] = " ".join(words)
    return docs


@pytest.fixture(scope="session")
def corpus():
    return make_corpus(200)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(d, f"https://example{d % 97}.com/page/{d:08d}", t) for d, t in corpus.items()],
        "doc_id long, url string, text string",
    )
