"""Round-5 part-zzzg twins: tau_ap and Spearman rho/footrule."""

from __future__ import annotations

import math

from lucenenet_spark.search.quality import spearman_rho, tau_ap


def _ranking(spark, ids_in_order):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_in_order)], "doc_id long, rank long"
    )


def _py_tau_ap(ref_order, obs_order):
    # conjoint docs, re-ranked per side in original order
    common = [d for d in ref_order if d in set(obs_order)]
    ref = {d: i + 1 for i, d in enumerate(common)}
    obs_l = [d for d in obs_order if d in set(ref_order)]
    m = len(obs_l)
    if m < 2:
        return m, 0, 0
    lcm = math.lcm(*range(1, 10))
    s = 0
    for i in range(2, m + 1):
        it = obs_l[i - 1]
        c = sum(1 for j in range(i - 1) if ref[obs_l[j]] < ref[it])
        s += c * (lcm // (i - 1))
    tau = 2.0 * s / ((m - 1) * float(lcm)) - 1.0
    return m, s, math.floor(tau * 1e6 + 0.5)


def test_tau_ap_replica(spark):
    ref = [10, 20, 30, 40, 50]
    obs = [20, 10, 50, 30, 40]
    r = tau_ap(_ranking(spark, ref), _ranking(spark, obs), k=10).collect()[0]
    m, s, tq = _py_tau_ap(ref, obs)
    assert (r["n_common"], r["s_lcm"], r["tau_ap_q6"]) == (m, s, tq)


def test_tau_ap_identical_is_one(spark):
    ref = [1, 2, 3, 4]
    r = tau_ap(_ranking(spark, ref), _ranking(spark, ref), k=10).collect()[0]
    assert r["tau_ap_q6"] == 1_000_000


def test_tau_ap_reversed_is_minus_one(spark):
    ref = [1, 2, 3, 4]
    r = tau_ap(_ranking(spark, ref), _ranking(spark, ref[::-1]), k=10).collect()[0]
    assert r["tau_ap_q6"] == -1_000_000


def test_tau_ap_top_weighted_asymmetry(spark):
    # swapping the top two hurts tau_ap more than swapping the bottom two
    ref = [1, 2, 3, 4, 5, 6]
    top_swap = [2, 1, 3, 4, 5, 6]
    bot_swap = [1, 2, 3, 4, 6, 5]
    t = tau_ap(_ranking(spark, ref), _ranking(spark, top_swap), k=10).collect()[0]
    b = tau_ap(_ranking(spark, ref), _ranking(spark, bot_swap), k=10).collect()[0]
    assert t["tau_ap_q6"] < b["tau_ap_q6"]


def _py_spearman(a_order, b_order):
    common = set(a_order) & set(b_order)
    ra = {d: i + 1 for i, d in enumerate(d for d in a_order if d in common)}
    rb = {d: i + 1 for i, d in enumerate(d for d in b_order if d in common)}
    m = len(common)
    d2 = sum((ra[d] - rb[d]) ** 2 for d in common)
    foot = sum(abs(ra[d] - rb[d]) for d in common)
    rho = 0 if m < 2 else math.floor(
        (1.0 - 6.0 * d2 / float(m * (m * m - 1))) * 1e6 + 0.5
    )
    return m, d2, foot, rho


def test_spearman_replica(spark):
    a = [10, 20, 30, 40, 50, 60]
    b = [30, 10, 60, 20, 70, 40]  # 70 not in a; 50 not in b
    r = spearman_rho(_ranking(spark, a), _ranking(spark, b), k=10).collect()[0]
    assert (r["n_common"], r["sum_d2"], r["footrule"], r["rho_q6"]) == _py_spearman(a, b)


def test_spearman_identical_and_reversed(spark):
    a = [1, 2, 3, 4, 5]
    same = spearman_rho(_ranking(spark, a), _ranking(spark, a), k=10).collect()[0]
    rev = spearman_rho(_ranking(spark, a), _ranking(spark, a[::-1]), k=10).collect()[0]
    assert same["rho_q6"] == 1_000_000 and same["sum_d2"] == 0
    assert rev["rho_q6"] == -1_000_000
    # footrule of full reversal of 5 items: 2*(4+2)+0 = 12
    assert rev["footrule"] == 12


def test_singleton_overlap_is_zero(spark):
    a = [1, 2]
    b = [2, 9]
    t = tau_ap(_ranking(spark, a), _ranking(spark, b), k=10).collect()[0]
    s = spearman_rho(_ranking(spark, a), _ranking(spark, b), k=10).collect()[0]
    assert t["n_common"] == 1 and t["tau_ap_q6"] == 0
    assert s["n_common"] == 1 and s["rho_q6"] == 0 and s["sum_d2"] == 0
