"""DFR / IB similarity family: golden scores from the reference's own
TestSimilarityBase.cs (:487-601) correctness tests, plus a distributed
differential (DFRSearcher lucene mode vs the scalar kernels recomputed
driver-side over the same postings)."""

import numpy as np
import pytest

from lucenenet_spark import TermQuery, build_index
from lucenenet_spark.index.smallfloat import norm_table
from lucenenet_spark.search.dfr import (
    DFRSearcher,
    dfr_score_scalar,
    ib_score_scalar,
)

# TestSimilarityBase.cs CreateStats constants
N_DOCS = 100
TOKENS = 5000
AVG = 50.0
DF = 10
TTF = 70
FREQ = 7.0
DOC_LEN = 40.0

STATS = dict(tf=FREQ, dl=DOC_LEN, df=DF, ttf=TTF, n_docs=N_DOCS, avg=AVG)

# (config, golden) — golden floats from the reference test methods
DFR_GOLDEN = [
    (("p", "l", "h2"), 2.2923636),            # TestPL2
    (("ine", "b", "h2"), 5.747603416442871),  # TestIneB2
    (("g", "l", "h1"), 1.6390540599822998),   # TestGL1
    (("be", "b", "h1"), 10.588263),           # TestBEB1
    (("d", "none", "none"), 16.328257),       # TestD
    (("in", "none", "h2"), 26.7459577898),    # TestIn2
    # TestIFB: the C# inline comments (0.8875 / 7.9676) are stale — the
    # assertion uses the COMPUTED B*IF = (72/88) * 8.977593 = 7.3453035
    (("if", "b", "none"), 7.345303535461426),
]

IB_GOLDEN = [
    (("ll", "df", "none"), 4.178574562072754),   # TestLLForIB
    (("spl", "ttf", "none"), 2.2387237548828125),  # TestSPLForIB
]


@pytest.mark.parametrize("cfg,gold", DFR_GOLDEN)
def test_dfr_golden(cfg, gold):
    model, ae, norm = cfg
    got = dfr_score_scalar(model, ae, norm, **STATS)
    assert got == pytest.approx(gold, abs=1e-5 * max(1.0, abs(gold)))


@pytest.mark.parametrize("cfg,gold", IB_GOLDEN)
def test_ib_golden(cfg, gold):
    dist, lam, norm = cfg
    got = ib_score_scalar(dist, lam, norm, tokens=TOKENS, **STATS)
    assert got == pytest.approx(gold, abs=1e-5 * max(1.0, abs(gold)))


@pytest.fixture(scope="module")
def small_index(spark):
    import random

    rng = random.Random(17)
    rows = [
        (d, " ".join(f"w{min(int(rng.paretovariate(1.3)), 25)}" for _ in range(rng.randint(6, 50))))
        for d in range(300)
    ]
    return build_index(spark.createDataFrame(rows, "doc_id long, text string")).cache()


@pytest.mark.parametrize(
    "family,kw",
    [
        ("dfr", dict(model="ine", after_effect="b", norm="h2")),
        ("dfr", dict(model="g", after_effect="l", norm="h1")),
        ("dfr", dict(model="if", after_effect="b", norm="none")),
        ("dfr", dict(model="in", after_effect="none", norm="h2")),
        ("ib", dict(distribution="spl", ib_lambda="ttf", norm="h2")),
        ("ib", dict(distribution="ll", ib_lambda="df", norm="h1")),
    ],
)
def test_distributed_matches_scalar_kernels(small_index, family, kw):
    idx = small_index
    s = DFRSearcher(idx, family=family, mode="lucene", **kw)
    got = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("w2")).collect()}
    assert len(got) > 20

    # driver recomputation from raw postings via the scalar kernels
    f32 = np.float32
    tbl = norm_table().astype(np.float64)
    stats = {
        (r["field"], r["term"]): (int(r["df"]), int(r["ttf"]))
        for r in idx.term_stats.collect()
    }
    fld = idx.default_field
    df_, ttf = stats[(fld, "w2")]
    tokens = idx._sttf(fld)
    avg = float(f32(f32(tokens) / idx.max_doc))
    rows = idx.postings.filter("term = 'w2'").select("doc_id", "tf", "norm_byte").collect()
    for r in rows:
        dl = float(tbl[r["norm_byte"]])
        if family == "dfr":
            exp = dfr_score_scalar(
                kw["model"], kw["after_effect"], kw["norm"],
                tf=float(r["tf"]), dl=dl, df=df_, ttf=ttf,
                n_docs=idx.max_doc, avg=avg,
            )
        else:
            exp = ib_score_scalar(
                kw["distribution"], kw["ib_lambda"], kw["norm"],
                tf=float(r["tf"]), dl=dl, df=df_, ttf=ttf,
                n_docs=idx.max_doc, avg=avg, tokens=tokens,
            )
        assert got[r["doc_id"]] == pytest.approx(exp, rel=2e-5, abs=2e-6), (
            family, kw, r["doc_id"], r["tf"], r["norm_byte"],
        )
