"""Round-5 part-zzk twins: IndexOrDocValues strategy choice and the
conjunction-order audit."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.cost_model import (
    index_or_docvalues_choice,
    intersection_order_audit,
)


def _index(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    return build_index(docs, text_col="text", id_col="doc_id")


def test_iod_choice_flips_with_selectivity(spark):
    # range ['r','s') covers 'rare'(df 1) .. 'rich'(df 6): cost 7.
    texts = (
        ["rare rich lead q"]
        + ["rich x"] * 5
        + ["lead y"] * 2
        + ["wide z"] * 7
    )
    idx = _index(spark, texts)
    rows = {
        r["lead_term"]: r
        for r in index_or_docvalues_choice(
            idx, ["lead", "wide"], "r", "s", verify_ratio=2
        ).collect()
    }
    assert rows["lead"]["range_cost"] == 7 and rows["lead"]["range_n_terms"] == 2
    # lead: df 3 -> verify 6 < 7 -> docvalues; wide: df 7 -> 14 >= 7 -> index
    assert rows["lead"]["lead_df"] == 3
    assert rows["lead"]["chosen"] == "docvalues"
    assert rows["wide"]["chosen"] == "index"


def test_iod_oov_lead_costs_zero(spark):
    idx = _index(spark, ["alpha beta", "beta gamma"])
    r = index_or_docvalues_choice(idx, ["nosuch"], "a", "b").collect()[0]
    assert r["lead_df"] == 0 and r["verify_cost"] == 0
    assert r["chosen"] == "docvalues"  # 0 < range_cost(alpha)=1


def test_iod_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        index_or_docvalues_choice(idx, [], "a", "b")
    with pytest.raises(ValueError):
        index_or_docvalues_choice(idx, ["x"], "a", "b", verify_ratio=0)


def test_intersection_audit_replica(spark):
    texts = [
        "aa bb cc dd",
        "aa bb cc",
        "aa bb",
        "bb dd",
        "cc dd",
        "dd qq",
    ]
    idx = _index(spark, texts)
    rows = {r["step"]: r for r in intersection_order_audit(idx, ["aa", "bb", "cc", "dd"]).collect()}
    toks = [t.split() for t in texts]

    def inter(terms):
        return sum(1 for t in toks if all(x in t for x in terms))

    # dfs: aa 3, bb 4, cc 3, dd 4 -> order: aa(3), cc(3), bb(4), dd(4)
    order = ["aa", "cc", "bb", "dd"]
    for k in range(1, 5):
        r = rows[k]
        assert r["term"] == order[k - 1]
        assert r["inter_size"] == inter(order[:k])
    # monotone nonincreasing prefix cardinalities
    sizes = [rows[k]["inter_size"] for k in range(1, 5)]
    assert sizes == sorted(sizes, reverse=True)


def test_intersection_audit_empty_tail(spark):
    texts = ["aa bb", "aa bb", "cc dd"]
    idx = _index(spark, texts)
    rows = {r["step"]: r for r in intersection_order_audit(idx, ["aa", "cc"]).collect()}
    assert rows[2]["inter_size"] == 0  # no doc has both


def test_intersection_audit_validation(spark):
    idx = _index(spark, ["x y"])
    with pytest.raises(ValueError):
        intersection_order_audit(idx, ["x"])
    with pytest.raises(ValueError):
        intersection_order_audit(idx, ["x", "x"])
