"""Round-5 part-zzq twins: MPC prefix-replay autocomplete ranks."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.suggest import mpc_prefix_ranks


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def _replica(texts, n_targets, max_prefix):
    docs = [set(t.split()) for t in texts]
    df = {}
    for d in docs:
        for t in d:
            df[t] = df.get(t, 0) + 1
    targets = sorted(df, key=lambda t: (-df[t], t))[:n_targets]
    out = {}
    for t in targets:
        for L in range(1, min(max_prefix, len(t)) + 1):
            px = t[:L]
            cands = [c for c in df if c.startswith(px)]
            rank = 1 + sum(
                1 for c in cands if df[c] > df[t] or (df[c] == df[t] and c < t)
            )
            out[(t, L)] = (len(cands), rank)
    return df, out


def test_mpc_ranks_replica(spark):
    texts = [
        "search searching seal sea q1",
        "search seal q2",
        "search q3",
        "merge mesh q4",
        "merge q5",
    ]
    idx = _index(spark, texts)
    df, want = _replica(texts, n_targets=20, max_prefix=3)
    got = {
        (r["term"], r["prefix_len"]): (r["n_candidates"], r["rank"])
        for r in mpc_prefix_ranks(idx, n_targets=20, max_prefix=3).collect()
    }
    assert got == want
    # 'search' (df 3) must be rank 1 for every prefix of itself
    for L in (1, 2, 3):
        assert got[("search", L)][1] == 1
    # 'sea' at prefix 3 competes with search/searching/seal: rank by df then alpha
    assert got[("sea", 3)][0] == 4


def test_mpc_longer_prefix_never_hurts(spark):
    texts = ["alpha alps q%d" % i for i in range(3)] + ["alpine q9"]
    idx = _index(spark, texts)
    rows = {}
    for r in mpc_prefix_ranks(idx, n_targets=10, max_prefix=4).collect():
        rows.setdefault(r["term"], {})[r["prefix_len"]] = r["rank"]
    for term, by_len in rows.items():
        ls = sorted(by_len)
        for a, b in zip(ls, ls[1:]):
            assert by_len[b] <= by_len[a]


def test_mpc_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        mpc_prefix_ranks(idx, n_targets=0)
    with pytest.raises(ValueError):
        mpc_prefix_ranks(idx, max_prefix=0)
