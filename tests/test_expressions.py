"""Expression-language compiler tests (Lucene.Net.Expressions parity).

Differential strategy: every expression is evaluated both through the
Spark Column path (collect over a small DataFrame) and through a pure
Python reference evaluator implementing the documented double/long
semantics of JavascriptCompiler's emitted bytecode.
"""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.search.expressions import (
    FUNCTIONS,
    JavascriptExpression,
    ParseException,
    SimpleBindings,
    compile_expression,
    expression_rescore,
    expression_sort,
)


# ----------------------------------------------------------------------
# pure-python reference evaluator (same semantics, independent code)
# ----------------------------------------------------------------------

_LONG_MASK = (1 << 64) - 1


def _to_long(v: float) -> int:
    if math.isnan(v):
        return 0
    if v <= -(2**63):
        return -(2**63)
    if v >= 2**63 - 1:
        return 2**63 - 1
    return int(v)


def _wrap_long(v: int) -> int:
    v &= _LONG_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def _py_eval(node, env):
    tag = node[0]
    if tag == "num":
        return node[1]
    if tag == "var":
        return float(env[node[1]])
    if tag == "call":
        args = [_py_eval(a, env) for a in node[2]]
        return _PY_FUNCS[node[1]](*args)
    if tag == "un":
        a = _py_eval(node[2], env)
        if node[1] == "-":
            return -a
        if node[1] == "~":
            return float(_wrap_long(~_to_long(a)))
        return 1.0 if a == 0.0 else 0.0
    if tag == "cond":
        c = _py_eval(node[1], env)
        return _py_eval(node[2] if c != 0.0 else node[3], env)
    op, ln, rn = node[1], node[2], node[3]
    a = _py_eval(ln, env)
    if op in ("&&", "||"):
        b = _py_eval(rn, env)
        ta, tb = a != 0.0, b != 0.0
        return 1.0 if (ta and tb if op == "&&" else ta or tb) else 0.0
    b = _py_eval(rn, env)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b if b != 0 else math.copysign(math.inf, a) * math.copysign(1, b)
    if op == "%":
        return math.fmod(a, b)
    if op in ("&", "|", "^"):
        al, bl = _to_long(a), _to_long(b)
        r = {"&": al & bl, "|": al | bl, "^": al ^ bl}[op]
        return float(_wrap_long(r))
    if op == "<<":
        return float(_wrap_long(_to_long(a) << (_to_long(b) & 63)))
    if op == ">>":
        return float(_to_long(a) >> (_to_long(b) & 63))
    if op == ">>>":
        return float((_to_long(a) & _LONG_MASK) >> (_to_long(b) & 63))
    cmp = {
        "==": a == b, "!=": a != b, "<": a < b,
        "<=": a <= b, ">": a > b, ">=": a >= b,
    }[op]
    return 1.0 if cmp else 0.0


_PY_FUNCS = {
    "abs": abs, "acos": math.acos, "acosh": math.acosh, "asin": math.asin,
    "asinh": math.asinh, "atan": math.atan, "atan2": math.atan2,
    "atanh": math.atanh, "ceil": math.ceil, "cos": math.cos,
    "cosh": math.cosh, "exp": math.exp, "floor": math.floor,
    "haversin": None,  # covered by a dedicated range test
    "ln": math.log, "log10": math.log10,
    "logn": lambda base, x: math.log(x) / math.log(base),
    "max": max, "min": min, "pow": math.pow, "sin": math.sin,
    "sinh": math.sinh, "sqrt": math.sqrt, "tan": math.tan, "tanh": math.tanh,
}


def _spark_eval(spark, source: str, env: dict[str, float]) -> float:
    expr = compile_expression(source)
    row = [tuple(float(env[v]) for v in expr.variables) or (0.0,)]
    cols = list(expr.variables) or ["_dummy"]
    df = spark.createDataFrame(row, ", ".join(f"`{c}` double" for c in cols))
    bindings = {v: df[v] for v in expr.variables}
    return df.select(expr.column(bindings).alias("r")).collect()[0]["r"]


CASES = [
    ("1 + 2 * 3", {}),
    ("(1 + 2) * 3", {}),
    ("2 - 3 - 4", {}),
    ("100 / 8 / 2", {}),
    ("7 % 3 + 10 % 4", {}),
    ("-x + +y", {"x": 3.5, "y": 2.0}),
    ("0x1F + 010 + 1.5e2", {}),
    ("sqrt(x) + ln(y)", {"x": 16.0, "y": math.e}),
    ("pow(x, 2) + logn(2, y)", {"x": 3.0, "y": 8.0}),
    ("min(x, y) * max(x, y)", {"x": 4.0, "y": -7.0}),
    ("abs(-x) + floor(y) + ceil(y)", {"x": 5.5, "y": 2.3}),
    ("atan2(y, x)", {"x": 3.0, "y": 4.0}),
    ("x > 2 ? y : -y", {"x": 3.0, "y": 10.0}),
    ("x > 2 ? y : -y", {"x": 1.0, "y": 10.0}),
    ("x == 3 && y != 0", {"x": 3.0, "y": 0.5}),
    ("x == 3 || y != 0", {"x": 1.0, "y": 0.0}),
    ("!x + !y", {"x": 0.0, "y": 5.0}),
    ("x <= y", {"x": 2.0, "y": 2.0}),
    ("x & 255", {"x": 1000.0}),
    ("x | 9", {"x": 6.0}),
    ("x ^ 5", {"x": 3.0}),
    ("~x", {"x": 10.0}),
    ("x << 3", {"x": 5.0}),
    ("x >> 2", {"x": -64.0}),
    ("x >>> 2", {"x": 64.0}),
    ("x << (1 + 2)", {"x": 3.0}),
    ("(x & 7) == 5 ? 100 : 1", {"x": 13.0}),
    ("0.3 * popularity / 10.0 + 0.7 * score", {"popularity": 42.0, "score": 1.25}),
    ("sinh(x) + cosh(x) + tanh(x)", {"x": 0.75}),
    ("asinh(x) + acosh(y) + atanh(z)", {"x": 0.5, "y": 2.0, "z": 0.25}),
    ("acos(x) + asin(x) + atan(x)", {"x": 0.5}),
]


@pytest.mark.parametrize("source,env", CASES, ids=[c[0] for c in CASES])
def test_differential_vs_python(spark, source, env):
    expr = compile_expression(source)
    expected = _py_eval(expr._ast, env)
    got = _spark_eval(spark, source, env)
    assert got == pytest.approx(expected, rel=1e-12, abs=1e-12), source


def test_variables_in_appearance_order():
    expr = compile_expression("b + a * b")
    assert expr.variables == ("b", "a")
    expr2 = compile_expression("min(z, y) + z")
    assert expr2.variables == ("z", "y")


def test_namespace_ids_allowed():
    expr = compile_expression("doc.popularity * 2")
    assert expr.variables == ("doc.popularity",)


@pytest.mark.parametrize(
    "bad",
    [
        "1 +",
        "(1 + 2",
        "foo(1)",
        "sqrt(1, 2)",
        "pow(1)",
        "1 @ 2",
        "? 1 : 2",
        "1 2",
    ],
)
def test_parse_errors(bad):
    with pytest.raises(ParseException):
        compile_expression(bad)


def test_shift_amount_must_be_constant():
    with pytest.raises(ParseException, match="shift amount"):
        compile_expression("x << y").column({"x": None, "y": None})


def test_haversin_range_and_zero(spark):
    df = spark.createDataFrame(
        [(40.7128, -74.0060, 48.8566, 2.3522)], "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    expr = compile_expression("haversin(lat1, lon1, lat2, lon2)")
    km = df.select(
        expr.column({c: df[c] for c in df.columns}).alias("km")
    ).collect()[0]["km"]
    # NYC -> Paris great-circle distance ~= 5837 km
    assert 5780 <= km <= 5900
    zero = df.select(
        compile_expression("haversin(lat1, lon1, lat1, lon1)")
        .column({"lat1": df["lat1"], "lon1": df["lon1"]})
        .alias("km")
    ).collect()[0]["km"]
    assert zero == pytest.approx(0.0, abs=1e-9)


def test_simple_bindings_subexpression_and_cycle(spark):
    df = spark.createDataFrame([(2.0, 3.0)], "a double, b double")
    inner = compile_expression("a * 10")
    outer = compile_expression("inner + b")
    b = SimpleBindings().add_field("a", df["a"]).add_field("b", df["b"])
    b.add_expression("inner", inner)
    val = df.select(outer.column(b).alias("r")).collect()[0]["r"]
    assert val == 23.0

    cyc = SimpleBindings()
    cyc.add_expression("self", compile_expression("self + 1"))
    with pytest.raises(ParseException, match="recursion"):
        compile_expression("self").column(cyc)


def test_unbound_variable_raises():
    with pytest.raises(ParseException, match="unbound"):
        compile_expression("nope + 1").column(SimpleBindings())


def test_expression_sort_topk(spark):
    rows = [(i, float((i * 37) % 11), float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, pop double, q double")
    out = expression_sort(
        df, "ln(pop + 1) + 0.5 * q", {"pop": df["pop"], "q": df["q"]}, k=5
    ).collect()
    scored = sorted(
        ((math.log(p + 1) + 0.5 * q, -i) for i, p, q in rows), reverse=True
    )[:5]
    assert [(-t[1]) for t in scored] == [r["doc_id"] for r in out]


def test_expression_rescore_uses_score_binding(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 10.0), (2, 1.0, 100.0), (3, 3.0, 0.0)],
        "doc_id long, score double, boostval double",
    )
    out = expression_rescore(
        df,
        "_score + ln(boostval + 1)",
        SimpleBindings().add_field("boostval", df["boostval"]),
        k=3,
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert got[2] == pytest.approx(1.0 + math.log(101.0))
    assert [r["doc_id"] for r in out] == [2, 1, 3]


def test_function_table_matches_reference_properties():
    # arity table from JavascriptCompiler.properties — 25 functions
    assert len(FUNCTIONS) == 25
    assert FUNCTIONS["haversin"] == 4
    assert FUNCTIONS["atan2"] == FUNCTIONS["logn"] == 2
