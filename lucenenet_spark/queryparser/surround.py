"""Surround query language: prefix-notation proximity algebra.

Reference: QueryParser/Surround/ (Parser/QueryParser.jj grammar +
Query/DistanceQuery.cs, OrQuery.cs, AndQuery.cs, NotQuery.cs,
SimpleTerm.cs): queries like  `not(4w(merge, key), dup)` where
  nW(a, b, ...)  — ordered proximity, distance n  (w == 1w, adjacency)
  nN(a, b, ...)  — unordered proximity, distance n
  and/or/not     — boolean composition (infix forms AND/OR/NOT also exist
                   in the grammar; this subset takes the prefix forms)
  terms may hold * / ? wildcards (SimpleTerm -> prefix/wildcard enum).

DistanceQuery maps to SpanNearQuery with slop = opDistance - 1 and
inOrder = (op is W)  (Query/DistanceQuery.cs DistanceSubQueryNotAllowed /
GetSpanNearQuery: "slop = opDistance - 1").

Spark-first: every leaf is a pushed-down term-dictionary predicate, W/N are
the span module's window joins, booleans are semi/anti joins on docsets.
The whole query compiles to ONE lazy DataFrame plan — Catalyst sees the
full tree and reorders the semi-joins.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.queries import PrefixQuery, WildcardQuery
from lucenenet_spark.search.spans import span_near_pattern_docs

_TOK = re.compile(r"\s*(?:(?P<op>\d*[wWnN]|and|or|not|AND|OR|NOT)\(|(?P<rp>\))|(?P<comma>,)|(?P<term>[^\s(),]+))")


def _parse(s: str, pos: int = 0):
    """-> (node, next_pos); node = ('op', name, dist, children) | ('term', t)."""
    m = _TOK.match(s, pos)
    if not m:
        raise ValueError(f"parse error at {pos} in {s!r}")
    if m.group("term"):
        return ("term", m.group("term").lower()), m.end()
    if not m.group("op"):
        raise ValueError(f"unexpected token at {pos} in {s!r}")
    op = m.group("op").lower()
    dist = 1
    dm = re.match(r"(\d+)([wn])", op)
    if dm:
        dist, op = int(dm.group(1)), dm.group(2)
    children, pos = [], m.end()
    while True:
        node, pos = _parse(s, pos)
        children.append(node)
        nm = _TOK.match(s, pos)
        if nm and nm.group("comma"):
            pos = nm.end()
            continue
        if nm and nm.group("rp"):
            return ("op", op, dist, children), nm.end()
        raise ValueError(f"expected , or ) at {pos} in {s!r}")


def parse_surround(s: str):
    node, pos = _parse(s)
    if s[pos:].strip():
        raise ValueError(f"trailing input: {s[pos:]!r}")
    return node


def _leaf_slot(term: str):
    if term.endswith("*") and "*" not in term[:-1] and "?" not in term:
        return PrefixQuery(prefix=term[:-1])
    if "*" in term or "?" in term:
        return WildcardQuery(pattern=term)
    return term


def surround_docs(index: InvertedIndex, query: str, field: str | None = None) -> DataFrame:
    """Evaluate a surround query to its matching docset."""
    return _eval(index, parse_surround(query), field)


def _term_docset(index: InvertedIndex, term: str, field) -> DataFrame:
    from lucenenet_spark.search.searcher import IndexSearcher

    fld = field or index.default_field
    slot = _leaf_slot(term)
    base = index.postings.filter(F.col("field") == fld)
    if isinstance(slot, str):
        base = base.filter(F.col("term") == slot)
    else:
        base = base.filter(IndexSearcher._term_predicate(slot))
    return base.select("doc_id").distinct()


def _eval(index: InvertedIndex, node, field) -> DataFrame:
    kind = node[0]
    if kind == "term":
        return _term_docset(index, node[1], field)
    _, op, dist, children = node
    if op in ("w", "n"):
        if any(c[0] != "term" for c in children):
            # grammar allows nested distance sub-queries only over spans;
            # the reference throws DistanceSubQueryNotAllowed for others
            raise ValueError("distance operands must be terms")
        slots = [_leaf_slot(c[1]) for c in children]
        return span_near_pattern_docs(
            index, slots, slop=dist - 1, in_order=(op == "w"), field=field
        )
    parts = [_eval(index, c, field) for c in children]
    if op == "and":
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, "doc_id", "left_semi")
        return out
    if op == "or":
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()
    if op == "not":
        # not(a, b, ...) = a minus (b or c ...)  (NotQuery.cs — the
        # reference's NotQuery is a >=2-operand composite; a 1-operand
        # not() would silently return the operand's docset, i.e.
        # INCLUSION instead of exclusion, so reject it)
        if len(parts) < 2:
            raise ValueError("not() requires at least 2 operands: not(a, b, ...)")
        out = parts[0]
        for p in parts[1:]:
            out = out.join(p, "doc_id", "left_anti")
        return out
    raise ValueError(f"unknown op {op!r}")
