"""SimpleQueryParser: the lenient end-user query syntax.

Reference: QueryParser/Simple/SimpleQueryParser.cs — "a parser for human
entered queries ... any errors in the query syntax are ignored and the
parser does the best it can". Syntax:

  term          — analyzed term (default operator joins adjacent clauses)
  +             — AND between clauses
  |             — OR between clauses
  -clause       — negation (MUST_NOT)
  "a b"         — phrase;  "a b"~N — sloppy phrase
  term*         — prefix;  bare * — match all docs
  term~N        — fuzzy (default 2 edits when N omitted)
  ( ... )       — grouping

NEVER throws: a stray ')' is skipped, an unterminated '"' runs to the end
of input, an unclosed '(' groups to the end, '\\' escapes the next char,
and any other character is simply part of a term. Degenerate input
degrades to the terms it contains.

Operator model (the reference's state machine, expressed as two
precedence levels): '+' binds tighter than '|'; bare whitespace joins at
the default operator's level (OR default, SimpleQueryParser.cs
defaultOperator). '-' applies to the clause that follows it, within its
AND-group; an all-negative group attaches as MUST_NOT at the top level.

Spark-first: the parser only BUILDS Query dataclasses — every leaf is the
same pushed-down plan the hand-built queries use; no new execution code.
"""

from __future__ import annotations

import re

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
)

_TERM_END = set(' \t\r\n()"+|')
_TILDE_N = re.compile(r"~(\d*)")


class SimpleQueryParser:
    def __init__(self, default_operator: str = "OR",
                 analyzer: StandardAnalyzer | None = None,
                 field: str | None = None):
        assert default_operator in ("OR", "AND")
        self.default_operator = default_operator
        self.analyzer = analyzer or StandardAnalyzer()
        self.field = field

    # ------------------------------------------------------------- public
    def parse(self, s: str) -> Query | None:
        """Parse leniently; returns None when the input holds no
        analyzable clause at all (reference returns a null query)."""
        q, _ = self._parse_region(s or "", 0, depth=0)
        return q

    # ------------------------------------------------------------ lexing
    def _parse_region(self, s: str, i: int, depth: int):
        items: list[tuple] = []
        n = len(s)
        while i < n:
            c = s[i]
            if c.isspace():
                i += 1
            elif c == "(":
                sub, i = self._parse_region(s, i + 1, depth + 1)
                if sub is not None:
                    items.append(("atom", sub))
            elif c == ")":
                i += 1
                if depth:
                    return self._build(items), i
                # stray ')' at top level: ignored (never throws)
            elif c == "+":
                items.append(("op", "+"))
                i += 1
            elif c == "|":
                items.append(("op", "|"))
                i += 1
            elif c == "-":
                items.append(("not",))
                i += 1
            elif c == '"':
                j = i + 1
                while j < n and s[j] != '"':
                    j += 2 if s[j] == "\\" else 1
                text = s[i + 1 : min(j, n)]
                i = j + 1 if j < n else n  # unterminated: run to end
                slop = 0
                m = _TILDE_N.match(s, i)
                if m:
                    slop = int(m.group(1) or 0)
                    i = m.end()
                q = self._phrase(text, slop)
                if q is not None:
                    items.append(("atom", q))
            else:
                j, buf = i, []
                while j < n and s[j] not in _TERM_END:
                    if s[j] == "\\" and j + 1 < n:
                        buf.append(s[j + 1])
                        j += 2
                    else:
                        buf.append(s[j])
                        j += 1
                i = j
                q = self._term_atom("".join(buf))
                if q is not None:
                    items.append(("atom", q))
        return self._build(items), i

    # ------------------------------------------------------------- atoms
    def _term_atom(self, tok: str) -> Query | None:
        if tok == "*":
            return MatchAllDocsQuery()
        m = re.search(r"~(\d*)$", tok)
        if m and len(tok) > len(m.group(0)):
            base = tok[: m.start()]
            edits = int(m.group(1)) if m.group(1) else 2
            return FuzzyQuery(term=base.lower(), max_edits=min(edits, 2),
                              field=self.field)
        if tok.endswith("*") and len(tok) > 1 and "*" not in tok[:-1]:
            return PrefixQuery(prefix=tok[:-1].lower(), field=self.field)
        terms = self.analyzer.terms(tok)
        if not terms:
            return None
        if len(terms) == 1:
            from lucenenet_spark.search.queries import TermQuery

            return TermQuery(terms[0], field=self.field)
        # a token that analyzes to several terms becomes the default
        # boolean over them (QueryBuilder.CreateBooleanQuery shape)
        from lucenenet_spark.search.queries import TermQuery

        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(t, field=self.field), Occur.SHOULD)
                for t in terms
            )
        )

    def _phrase(self, text: str, slop: int) -> Query | None:
        toks = self.analyzer.tokenize_text(text)
        if not toks:
            return None
        if len(toks) == 1:
            from lucenenet_spark.search.queries import TermQuery

            return TermQuery(toks[0][0], field=self.field)
        return PhraseQuery(
            terms=tuple(t for t, _ in toks),
            positions=tuple(p for _, p in toks),
            slop=slop,
            field=self.field,
        )

    # ----------------------------------------------------------- builder
    def _build(self, items: list[tuple]) -> Query | None:
        # group atoms into OR-separated AND-groups; '-' negates the next atom
        groups: list[list[tuple[Query, bool]]] = []
        cur: list[tuple[Query, bool]] = []
        join: str | None = None
        neg = False
        for it in items:
            if it[0] == "op":
                join = it[1]
            elif it[0] == "not":
                neg = not neg
            else:
                op = join if join is not None else (
                    "+" if self.default_operator == "AND" else "|"
                )
                if cur and op == "|":
                    groups.append(cur)
                    cur = []
                cur.append((it[1], neg))
                join, neg = None, False
        if cur:
            groups.append(cur)
        if not groups:
            return None

        def build_group(g):
            pos = [q for q, n_ in g if not n_]
            negs = [q for q, n_ in g if n_]
            if not pos:
                return None, negs  # all-negative: hoist to the top level
            if len(pos) == 1 and not negs:
                return pos[0], []
            return BooleanQuery(
                clauses=tuple(
                    [BooleanClause(q, Occur.MUST) for q in pos]
                    + [BooleanClause(q, Occur.MUST_NOT) for q in negs]
                )
            ), []

        built = [build_group(g) for g in groups]
        positives = [q for q, _ in built if q is not None]
        hoisted = [q for _, ns in built for q in ns]
        if len(positives) == 1 and not hoisted:
            return positives[0]
        if not positives and not hoisted:
            return None
        return BooleanQuery(
            clauses=tuple(
                [BooleanClause(q, Occur.SHOULD) for q in positives]
                + [BooleanClause(q, Occur.MUST_NOT) for q in hoisted]
            )
        )
