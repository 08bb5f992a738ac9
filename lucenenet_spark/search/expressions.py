"""Lucene expression language compiled to Spark Columns.

Re-expresses ``Lucene.Net.Expressions`` — the javascript-like expression
language users attach to sorts, rescorers, and function queries — as a
compiler from expression source to a single Spark ``Column``:

- ``JavascriptCompiler.Compile(source)`` (reference
  ``Lucene.Net.Expressions/JS/JavascriptCompiler.cs``) ≙
  :func:`compile_expression`, a recursive-descent parser over the same
  grammar (``JS/Javascript.g4``: ternary > || > && > | > ^ > & >
  equality > relational > shift > additive > multiplicative > unary >
  call/primary) producing an AST, then a pure-Column code generator. No
  Python runs per row — the whole expression lowers to Catalyst
  expressions inside whole-stage codegen.
- ``SimpleBindings`` (``Expressions/SimpleBindings.cs``) ≙
  :class:`SimpleBindings` — maps variable names to document columns,
  the relevance score (``_score``), or other compiled expressions
  (recursive inlining, cycle-checked like the reference's
  ``CheckSelfRecursion``).
- ``ExpressionSortField`` / ``ExpressionRescorer``
  (``Expressions/ExpressionSortField.cs``, ``ExpressionRescorer.cs``) ≙
  :func:`expression_sort` / :func:`expression_rescore` — thin drivers
  that evaluate the compiled column over a DataFrame and order by it.

Double semantics follow the reference's compiled IL (every value is a
``double``; comparisons and boolean operators produce 1.0/0.0; the
ternary tests ``!= 0``; bitwise/shift operators pass through a ``long``
cast and back, ``JavascriptCompiler.cs`` CompileExpression bytecode).
Deviations, both documented:

- Shift amounts must be compile-time constants (Spark's shiftleft /
  shiftright take literal bit counts). The reference allows column
  shift amounts; constant amounts cover every published example.
- ``haversin`` uses exact trig over the latitude-dependent WGS84
  geocentric diameter instead of ``SloppyMath``'s table-quantized
  cos/asin approximations (``Util/SloppyMath.cs:48-60,163-169``) — an
  accuracy upgrade, same formula shape, result in kilometers.
"""

from __future__ import annotations

import math
import re
from typing import Callable, Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "JavascriptExpression",
    "ParseException",
    "SimpleBindings",
    "compile_expression",
    "expression_sort",
    "expression_rescore",
]


class ParseException(ValueError):
    """Raised for syntax errors, unknown functions, and arity mismatches
    (reference: JavascriptParserErrorStrategy / IllegalArgumentException)."""


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+(?![89.eE]))
  | (?P<decimal>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<name>[A-Za-z_$][A-Za-z0-9_$]*(?:\.[A-Za-z_$][A-Za-z0-9_$]*)*)
  | (?P<op>>>>|<<|>>|<=|>=|==|!=|&&|\|\||[-+*/%()<>!?:&|^~,])
    """,
    re.VERBOSE,
)


def _tokenize(source: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(source):
        m = _TOKEN_RE.match(source, pos)
        if m is None:
            raise ParseException(
                f"unexpected character {source[pos]!r} at position {pos} in {source!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# --------------------------------------------------------------------------
# Parser — precedence ladder mirrors Javascript.g4 rule for rule
# --------------------------------------------------------------------------

# AST: ('num', float) | ('var', name) | ('call', fname, [args])
#    | ('un', op, a) | ('bin', op, a, b) | ('cond', c, a, b)

_BINARY_LEVELS: Sequence[tuple[str, ...]] = (
    ("||",),
    ("&&",),
    ("|",),
    ("^",),
    ("&",),
    ("==", "!="),
    ("<", "<=", ">", ">="),
    ("<<", ">>", ">>>"),
    ("+", "-"),
    ("*", "/", "%"),
)

# name -> arity (JavascriptCompiler.properties)
FUNCTIONS: dict[str, int] = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1,
    "atan": 1, "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1,
    "cosh": 1, "exp": 1, "floor": 1, "haversin": 4, "ln": 1,
    "log10": 1, "logn": 2, "max": 2, "min": 2, "pow": 2,
    "sin": 1, "sinh": 1, "sqrt": 1, "tan": 1, "tanh": 1,
}


class _Parser:
    def __init__(self, source: str):
        self.source = source
        self.toks = _tokenize(source)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def take(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        kind, tok = self.take()
        if tok != text:
            raise ParseException(
                f"expected {text!r} but found {tok or '<eof>'!r} in {self.source!r}"
            )

    def parse(self):
        node = self.conditional()
        kind, tok = self.take()
        if kind != "eof":
            raise ParseException(f"trailing input {tok!r} in {self.source!r}")
        return node

    def conditional(self):
        cond = self.binary(0)
        if self.peek()[1] == "?":
            self.take()
            a = self.conditional()
            self.expect(":")
            b = self.conditional()
            return ("cond", cond, a, b)
        return cond

    def binary(self, level: int):
        if level >= len(_BINARY_LEVELS):
            return self.unary()
        ops = _BINARY_LEVELS[level]
        node = self.binary(level + 1)
        while self.peek()[1] in ops and self.peek()[0] == "op":
            _, op = self.take()
            rhs = self.binary(level + 1)
            node = ("bin", op, node, rhs)
        return node

    def unary(self):
        kind, tok = self.peek()
        if kind == "op" and tok in ("+", "-", "!", "~"):
            self.take()
            operand = self.unary()
            if tok == "+":
                return operand
            return ("un", tok, operand)
        return self.postfix()

    def postfix(self):
        kind, tok = self.peek()
        if kind == "name":
            self.take()
            if self.peek()[1] == "(":
                return self.call(tok)
            return ("var", tok)
        if kind in ("hex", "octal", "decimal"):
            self.take()
            if kind == "hex":
                return ("num", float(int(tok, 16)))
            if kind == "octal":
                return ("num", float(int(tok, 8)))
            return ("num", float(tok))
        if tok == "(":
            self.take()
            node = self.conditional()
            self.expect(")")
            return node
        raise ParseException(f"unexpected token {tok or '<eof>'!r} in {self.source!r}")

    def call(self, fname: str):
        if fname not in FUNCTIONS:
            raise ParseException(f"unrecognized function {fname!r}")
        self.expect("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.conditional())
            while self.peek()[1] == ",":
                self.take()
                args.append(self.conditional())
        self.expect(")")
        arity = FUNCTIONS[fname]
        if len(args) != arity:
            raise ParseException(
                f"function {fname!r} expects {arity} argument(s), got {len(args)}"
            )
        return ("call", fname, args)


# --------------------------------------------------------------------------
# Constant folding (for shift amounts) and variable collection
# --------------------------------------------------------------------------


def _const_value(node) -> float | None:
    """Evaluate a numeric-literal subtree, or None if it references
    variables. Only the operators needed for shift amounts."""
    tag = node[0]
    if tag == "num":
        return node[1]
    if tag == "un":
        v = _const_value(node[2])
        if v is None:
            return None
        if node[1] == "-":
            return -v
        if node[1] == "~":
            return float(~_d2l(v))
        return 1.0 if v == 0.0 else 0.0
    if tag == "bin" and node[1] in ("+", "-", "*"):
        a, b = _const_value(node[2]), _const_value(node[3])
        if a is None or b is None:
            return None
        return {"+": a + b, "-": a - b, "*": a * b}[node[1]]
    return None


_LONG_MIN, _LONG_MAX = -(1 << 63), (1 << 63) - 1


def _d2l(v: float) -> int:
    """Java (long) double cast: truncate toward zero, saturate, NaN→0."""
    if math.isnan(v):
        return 0
    if v <= _LONG_MIN:
        return _LONG_MIN
    if v >= _LONG_MAX:
        return _LONG_MAX
    return int(v)


def _collect_vars(node, out: list[str]) -> None:
    tag = node[0]
    if tag == "var":
        if node[1] not in out:
            out.append(node[1])
    elif tag == "call":
        for a in node[2]:
            _collect_vars(a, out)
    elif tag == "un":
        _collect_vars(node[2], out)
    elif tag == "bin":
        _collect_vars(node[2], out)
        _collect_vars(node[3], out)
    elif tag == "cond":
        for sub in node[1:]:
            _collect_vars(sub, out)


# --------------------------------------------------------------------------
# Code generation: AST -> Column (all JVM-side)
# --------------------------------------------------------------------------

_D = "double"
_L = "bigint"

# WGS84 semi-axes in km (SloppyMath.cs earthDiameterPerLatitude source)
_WGS84_A = 6378.137
_WGS84_B = 6356.7523142


def _haversin_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    x1 = F.radians(lat1)
    x2 = F.radians(lat2)
    h1 = F.lit(1.0) - F.cos(x1 - x2)
    h2 = F.lit(1.0) - F.cos(F.radians(lon1 - lon2))
    h = (h1 + F.cos(x1) * F.cos(x2) * h2) / F.lit(2.0)
    avg = (x1 + x2) / F.lit(2.0)
    a2c = F.lit(_WGS84_A * _WGS84_A) * F.cos(avg)
    b2s = F.lit(_WGS84_B * _WGS84_B) * F.sin(avg)
    ac = F.lit(_WGS84_A) * F.cos(avg)
    bs = F.lit(_WGS84_B) * F.sin(avg)
    diameter = F.lit(2.0) * F.sqrt((a2c * a2c + b2s * b2s) / (ac * ac + bs * bs))
    return diameter * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def _truthy(c: Column) -> Column:
    return c != F.lit(0.0)


def _as_bool_double(cond: Column) -> Column:
    return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))


def _gen(node, resolve: Callable[[str], Column]) -> Column:
    tag = node[0]
    if tag == "num":
        return F.lit(float(node[1]))
    if tag == "var":
        return resolve(node[1]).cast(_D)
    if tag == "call":
        args = [_gen(a, resolve) for a in node[2]]
        return _FUNC_GEN[node[1]](*args)
    if tag == "un":
        a = _gen(node[2], resolve)
        if node[1] == "-":
            return -a
        if node[1] == "~":
            return F.bitwise_not(a.cast(_L)).cast(_D)
        return _as_bool_double(a == F.lit(0.0))  # '!'
    if tag == "cond":
        c = _gen(node[1], resolve)
        return F.when(_truthy(c), _gen(node[2], resolve)).otherwise(_gen(node[3], resolve))
    # binary
    op, ln_, rn = node[1], node[2], node[3]
    if op in ("<<", ">>", ">>>"):
        amt = _const_value(rn)
        if amt is None:
            raise ParseException(
                f"shift amount must be a constant expression (got {rn!r}); "
                "the Spark shift builtins take literal bit counts"
            )
        bits = _d2l(amt) & 63  # Java long-shift masks the amount to 6 bits
        base = _gen(ln_, resolve).cast(_L)
        fn = {"<<": F.shiftleft, ">>": F.shiftright, ">>>": F.shiftrightunsigned}[op]
        return fn(base, bits).cast(_D)
    a = _gen(ln_, resolve)
    b = _gen(rn, resolve)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return a / b
    if op == "%":
        return a % b
    if op in ("&", "|", "^"):
        al, bl = a.cast(_L), b.cast(_L)
        meth = {"&": "bitwiseAND", "|": "bitwiseOR", "^": "bitwiseXOR"}[op]
        return getattr(al, meth)(bl).cast(_D)
    if op == "==":
        return _as_bool_double(a == b)
    if op == "!=":
        return _as_bool_double(a != b)
    if op == "<":
        return _as_bool_double(a < b)
    if op == "<=":
        return _as_bool_double(a <= b)
    if op == ">":
        return _as_bool_double(a > b)
    if op == ">=":
        return _as_bool_double(a >= b)
    if op == "&&":
        return _as_bool_double(_truthy(a) & _truthy(b))
    if op == "||":
        return _as_bool_double(_truthy(a) | _truthy(b))
    raise AssertionError(op)


_FUNC_GEN: dict[str, Callable[..., Column]] = {
    "abs": F.abs,
    "acos": F.acos,
    "acosh": F.acosh,
    "asin": F.asin,
    "asinh": F.asinh,
    "atan": F.atan,
    "atan2": F.atan2,
    "atanh": F.atanh,
    "ceil": lambda a: F.ceil(a).cast(_D),
    "cos": F.cos,
    "cosh": F.cosh,
    "exp": F.exp,
    "floor": lambda a: F.floor(a).cast(_D),
    "haversin": _haversin_km,
    "ln": F.log,
    "log10": F.log10,
    "logn": lambda base, x: F.log(x) / F.log(base),
    "max": F.greatest,
    "min": F.least,
    "pow": F.pow,
    "sin": F.sin,
    "sinh": F.sinh,
    "sqrt": F.sqrt,
    "tan": F.tan,
    "tanh": F.tanh,
}


class JavascriptExpression:
    """A compiled expression: source + referenced variables + a Column
    generator (reference ``Expressions/Expression.cs``: ``SourceText``,
    ``Variables``, ``Evaluate``)."""

    def __init__(self, source: str, ast):
        self.source = source
        self._ast = ast
        names: list[str] = []
        _collect_vars(ast, names)
        self.variables: tuple[str, ...] = tuple(names)

    def column(self, bindings: Union["SimpleBindings", Mapping[str, Column]]) -> Column:
        """Lower to a Spark Column given variable bindings."""
        if isinstance(bindings, SimpleBindings):
            resolve = bindings._resolver()
        else:
            def resolve(name: str, _m=bindings) -> Column:
                if name not in _m:
                    raise ParseException(f"unbound variable {name!r}")
                return _m[name]
        return _gen(self._ast, resolve)

    def __repr__(self) -> str:  # pragma: no cover
        return f"JavascriptExpression({self.source!r})"


def compile_expression(source: str) -> JavascriptExpression:
    """``JavascriptCompiler.Compile`` analogue."""
    return JavascriptExpression(source, _Parser(source).parse())


class SimpleBindings:
    """Name -> column / score / sub-expression map
    (``Expressions/SimpleBindings.cs``). Sub-expressions inline
    recursively; self-recursion raises (``CheckSelfRecursion``)."""

    SCORE = "_score"

    def __init__(self) -> None:
        self._map: dict[str, Union[str, Column, JavascriptExpression]] = {}

    def add_field(self, name: str, column: Union[str, Column, None] = None) -> "SimpleBindings":
        self._map[name] = column if column is not None else name
        return self

    def add_expression(self, name: str, expr: JavascriptExpression) -> "SimpleBindings":
        self._map[name] = expr
        return self

    def _resolver(self) -> Callable[[str], Column]:
        def resolve(name: str, _stack: tuple[str, ...] = ()) -> Column:
            if name in _stack:
                raise ParseException(f"recursion error: cycle through {name!r}")
            if name not in self._map:
                raise ParseException(f"unbound variable {name!r}")
            bound = self._map[name]
            if isinstance(bound, JavascriptExpression):
                inner = _stack + (name,)
                return _gen(bound._ast, lambda n: resolve(n, inner))
            if isinstance(bound, str):
                return F.col(bound)
            return bound
        return resolve


def expression_sort(
    df: DataFrame,
    expr: Union[str, JavascriptExpression],
    bindings: Union[SimpleBindings, Mapping[str, Column]],
    *,
    k: int,
    ascending: bool = False,
    tie_col: str = "doc_id",
    out_col: str = "expr_value",
) -> DataFrame:
    """``Sort by expression`` (``ExpressionSortField.cs``): evaluate the
    compiled column, TakeOrdered top-k with a deterministic tie-break.
    The sort is a Spark TakeOrderedAndProject — no global sort at scale.
    """
    if isinstance(expr, str):
        expr = compile_expression(expr)
    col = expr.column(bindings)
    scored = df.withColumn(out_col, col)
    order = [F.col(out_col).asc() if ascending else F.col(out_col).desc(), F.col(tie_col).asc()]
    return scored.orderBy(*order).limit(k)


def expression_rescore(
    hits: DataFrame,
    expr: Union[str, JavascriptExpression],
    bindings: Union[SimpleBindings, Mapping[str, Column]] = None,
    *,
    score_col: str = "score",
    k: int | None = None,
    tie_col: str = "doc_id",
) -> DataFrame:
    """``ExpressionRescorer.Rescore``: re-order an existing top-N hits
    DataFrame (columns incl. ``score``) by an expression over ``_score``
    and any joined doc-value columns; keep top-k of the rescored set."""
    if isinstance(expr, str):
        expr = compile_expression(expr)
    if bindings is None:
        bindings = SimpleBindings()
    if isinstance(bindings, SimpleBindings) and SimpleBindings.SCORE not in bindings._map:
        bindings.add_field(SimpleBindings.SCORE, F.col(score_col))
    out = hits.withColumn(score_col, expr.column(bindings))
    if k is not None:
        out = out.orderBy(F.col(score_col).desc(), F.col(tie_col).asc()).limit(k)
    return out
