"""Round-5 part-zzzh twins: k-center coreset and LOO 1-NN label error."""

from __future__ import annotations

import math

from lucenenet_spark.functions.similarity import kcenter_select, loo_1nn_errors


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _q(v, scale=1000):
    return [math.floor(float(x) * scale + 0.5) for x in v]


def _py_kcenter(rows, k):
    vq = {r[0]: _q(r[1]) for r in rows}
    ids = sorted(vq)
    chosen = [ids[0]]
    out = [(1, ids[0], 0)]
    for r in range(2, k + 1):
        best = None
        for v in ids:
            if v in chosen:
                continue
            md = min(
                sum((a - b) ** 2 for a, b in zip(vq[v], vq[c])) for c in chosen
            )
            # ids iterate ascending, so on an equal max-min distance the
            # earlier (smaller) id is kept — the engine's tie-break
            if best is None or md > best[1]:
                best = (v, md)
        chosen.append(best[0])
        out.append((r, best[0], best[1]))
    return out


def test_kcenter_replica(spark):
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [10.0, 0.0], 0),
        (2, [0.0, 10.0], 1),
        (3, [10.0, 10.0], 1),
        (4, [5.0, 5.0], 0),
        (5, [0.1, 0.1], 1),
    ]
    got = [
        (r["round"], r["vec_id"], r["maxmin_d2"])
        for r in kcenter_select(_emb(spark, rows), k=4).orderBy("round").collect()
    ]
    assert got == _py_kcenter(rows, 4)


def test_kcenter_radius_nonincreasing(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5), float(i % 2)], 0) for i in range(12)]
    rads = [
        r["maxmin_d2"]
        for r in kcenter_select(_emb(spark, rows), k=5).orderBy("round").collect()
    ][1:]
    assert rads == sorted(rads, reverse=True)


def test_kcenter_seed_is_min_id(spark):
    rows = [(7, [1.0], 0), (3, [2.0], 0), (9, [9.0], 0)]
    first = kcenter_select(_emb(spark, rows), k=2).orderBy("round").collect()[0]
    assert first["vec_id"] == 3 and first["maxmin_d2"] == 0


def _py_loo(rows):
    vq = {r[0]: _q(r[1]) for r in rows}
    lab = {r[0]: r[2] for r in rows}
    res = {}
    for a in vq:
        best = None
        for b in sorted(vq):
            if b == a:
                continue
            d = sum((x - y) ** 2 for x, y in zip(vq[a], vq[b]))
            if best is None or d < best[1]:
                best = (b, d)
        la, lb = lab[a], lab[best[0]]
        n, e = res.get(la, (0, 0))
        res[la] = (n + 1, e + (1 if la != lb else 0))
    return sorted(
        (l, n, e, e * 1_000_000 // n) for l, (n, e) in res.items()
    )


def test_loo_1nn_replica(spark):
    rows = [
        (0, [0.0, 0.0], 0),
        (1, [0.1, 0.0], 0),
        (2, [0.0, 0.2], 1),   # nearest is 0/1 (label 0) -> error
        (3, [5.0, 5.0], 1),
        (4, [5.1, 5.0], 1),
        (5, [9.0, 9.0], 0),   # nearest is 3/4 (label 1) -> error
    ]
    got = [
        (r["label"], r["n"], r["errors"], r["err_ppm"])
        for r in loo_1nn_errors(_emb(spark, rows)).collect()
    ]
    assert got == _py_loo(rows)


def test_loo_1nn_perfect_clusters(spark):
    rows = [
        (0, [0.0], 0), (1, [0.2], 0), (2, [0.1], 0),
        (3, [9.0], 1), (4, [9.2], 1),
    ]
    got = loo_1nn_errors(_emb(spark, rows)).collect()
    assert all(r["errors"] == 0 and r["err_ppm"] == 0 for r in got)
    assert sum(r["n"] for r in got) == 5


def test_loo_1nn_tie_breaks_by_smaller_id(spark):
    # vec 2 equidistant from 0 (label 0) and 1 (label 1): nn = 0 -> no error
    rows = [(0, [0.0], 0), (1, [2.0], 1), (2, [1.0], 0)]
    got = {r["label"]: r for r in loo_1nn_errors(_emb(spark, rows)).collect()}
    # label-0 rows: vec0 (nn=2, label 0, ok), vec2 (nn=0 by tie, ok)
    assert got[0]["errors"] == 0
