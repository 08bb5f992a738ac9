"""Classic query-parser subset: term, "phrase", +/-, AND/OR/NOT, boosts,
wildcards, fuzzy, ranges.

Covers the grammar subset exercised by the reference benchmark query sets
(src/Lucene.Net.Benchmark/ByTask/Feeds/ReutersQueryMaker.cs:37-51,
EnwikiQueryMaker.cs:40-66) of the full JavaCC grammar
(src/Lucene.Net.QueryParser/Classic/QueryParser.cs; token kinds at
Classic/QueryParserConstants.cs:37-85).

Text leaves are analyzed with the SAME analyzer as indexing
(Util/QueryBuilder.cs:89-170): one surviving token → TermQuery, several →
BooleanQuery with the default operator, quoted → PhraseQuery whose
positions honor stopword holes.
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
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<gfield>[A-Za-z_][A-Za-z0-9_]*):\( |
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
        (?P<plus>\+) | (?P<minus>-) |
        (?P<quoted>(?:(?P<qfield>[A-Za-z_][A-Za-z0-9_]*):)?
                   "(?P<qtext>[^"]*)"(?:~(?P<slop>\d+))?) |
        (?P<range>(?:(?P<rfield>[A-Za-z_][A-Za-z0-9_]*):)?
                  (?P<rlb>[\[{])(?P<rlo>\S+)\s+TO\s+(?P<rhi>\S+)(?P<rub>[\]}])) |
        (?P<star>\*) |
        (?P<word>(?:[^\s()+\-"\\]|\\.)+)
    )""",
    re.VERBOSE,
)

_FIELD_PREFIX = re.compile(r"^(?P<f>[A-Za-z_][A-Za-z0-9_]*):(?P<rest>.+)$")


def _unescape(s: str) -> str:
    """QueryParserBase.DiscardEscapeChar: drop the backslash, keep the
    escaped character literally."""
    return re.sub(r"\\(.)", r"\1", s)


def _unescaped_has(s: str, ch: str) -> bool:
    """True if `ch` occurs in s NOT preceded by a backslash."""
    return re.search(r"(?<!\\)" + re.escape(ch), s) is not None

_BOOST = re.compile(r"^(?P<body>.*?)\^(?P<boost>[0-9.]+)$")
_FUZZY = re.compile(r"^(?P<body>.*?)~(?P<edits>[0-9.]*)$")


class QueryParser:
    def __init__(self, default_operator: str = "OR", analyzer: StandardAnalyzer | None = None):
        assert default_operator in ("OR", "AND")
        self.default_occur = Occur.SHOULD if default_operator == "OR" else Occur.MUST
        self.analyzer = analyzer or StandardAnalyzer()

    def parse(self, s: str) -> Query:
        clauses: list[BooleanClause] = []
        pending: Occur | None = None
        pos = 0
        while pos < len(s):
            m = _TOKEN.match(s, pos)
            if not m or m.end() == pos:
                break
            pos = m.end()
            if m.group("lparen") or m.group("gfield"):
                depth, j = 1, pos
                while j < len(s) and depth:
                    depth += {"(": 1, ")": -1}.get(s[j], 0)
                    j += 1
                inner = self.parse(s[pos : j - 1])
                if m.group("gfield"):
                    # grouped field syntax field:(a b) — the group's field
                    # overrides the default for every field-less leaf
                    # (classic grammar: SetField applies to the clause list)
                    inner = _with_field(inner, m.group("gfield"))
                boost = 1.0
                bm = re.match(r"\^([0-9.]+)", s[j:])
                if bm:
                    boost = float(bm.group(1))
                    j += bm.end()
                pos = j
                clauses.append(BooleanClause(_boosted(inner, boost), pending or self.default_occur))
                pending = None
            elif m.group("and"):
                # AddClause(CONJ_AND): the PREVIOUS clause becomes required
                # unless prohibited (Classic/QueryParserBase.cs AddClause)
                if clauses and clauses[-1].occur is not Occur.MUST_NOT:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
                pending = Occur.MUST
            elif m.group("or"):
                # AddClause(CONJ_OR) under default AND: the previous clause
                # is DEMOTED to optional unless prohibited
                if (
                    self.default_occur is Occur.MUST
                    and clauses
                    and clauses[-1].occur is not Occur.MUST_NOT
                ):
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.SHOULD)
                pending = Occur.SHOULD
            elif m.group("not"):
                pending = Occur.MUST_NOT
            elif m.group("plus"):
                pending = Occur.MUST
            elif m.group("minus"):
                pending = Occur.MUST_NOT
            elif m.group("quoted") is not None:
                slop = int(m.group("slop") or 0)
                boost = 1.0
                q = self._phrase(m.group("qtext"), slop, boost, field=m.group("qfield"))
                if q is not None:
                    clauses.append(BooleanClause(q, pending or self.default_occur))
                pending = None
            elif m.group("range"):
                # [inclusive] vs {exclusive} bounds (Classic grammar RANGEIN
                # vs RANGEEX); '*' as an open end
                lo, hi = m.group("rlo"), m.group("rhi")
                q = TermRangeQuery(
                    lower=None if lo == "*" else lo,
                    upper=None if hi == "*" else hi,
                    include_lower=m.group("rlb") == "[",
                    include_upper=m.group("rub") == "]",
                    field=m.group("rfield"),
                )
                clauses.append(BooleanClause(q, pending or self.default_occur))
                pending = None
            elif m.group("star"):
                clauses.append(BooleanClause(MatchAllDocsQuery(), pending or self.default_occur))
                pending = None
            elif m.group("word"):
                q = self._word(m.group("word"))
                if q is not None:
                    clauses.append(BooleanClause(q, pending or self.default_occur))
                pending = None
        if not clauses:
            return MatchAllDocsQuery()
        return rewrite(BooleanQuery(clauses=tuple(clauses)))

    # ------------------------------------------------------------------
    def _word(self, w: str) -> Query | None:
        # field:term prefix — QueryParserBase field defaulting
        # (Classic/QueryParserBase.cs; demo SearchFiles.cs parses field:term).
        # An escaped colon (\:) is literal text, not a field separator.
        field = None
        fp = _FIELD_PREFIX.match(w)
        if fp and not fp.group("rest").startswith(":"):
            # (an escaped colon can't match: the regex requires ':' right
            # after the bare field name, and '\' is not a name character)
            field, w = fp.group("f"), fp.group("rest")
        boost = 1.0
        bm = _BOOST.match(w)
        if bm and _unescaped_has(w, "^"):
            w, boost = bm.group("body"), float(bm.group("boost"))
        fm = _FUZZY.match(w)
        has_wild = _unescaped_has(w, "*") or _unescaped_has(w, "?")
        if fm and _unescaped_has(w, "~") and not has_wild:
            body = _unescape(fm.group("body"))
            edits = fm.group("edits")
            max_edits = 2 if edits in ("", None) else int(float(edits))
            return self._get_fuzzy_query(body, max_edits, field=field, boost=boost)
        if w.endswith("*") and not _unescaped_has(w[:-1], "*") and not _unescaped_has(w, "?") and _unescaped_has(w, "*"):
            return self._get_prefix_query(_unescape(w[:-1]), field=field, boost=boost)
        if has_wild:
            return self._get_wildcard_query(w, field=field, boost=boost)
        toks = self.analyzer.terms(_unescape(w))
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0], field=field, boost=boost)
        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(t, field=field), self.default_occur) for t in toks
            ),
            boost=boost,
        )

    # ------------------------------------------------------------------
    # Expanded-term construction hooks (QueryParserBase.GetPrefixQuery /
    # GetWildcardQuery / GetFuzzyQuery): the classic parser lower-cases
    # the raw text (LowercaseExpandedTerms=true default) WITHOUT running
    # the analyzer; AnalyzingQueryParser overrides these to analyze each
    # chunk instead.
    def _get_prefix_query(self, body: str, field: str | None, boost: float) -> Query:
        return PrefixQuery(body.lower(), field=field, boost=boost)

    def _get_wildcard_query(self, w: str, field: str | None, boost: float) -> Query:
        return WildcardQuery(w.lower(), field=field, boost=boost)

    def _get_fuzzy_query(
        self, body: str, max_edits: int, field: str | None, boost: float
    ) -> Query | None:
        terms = self.analyzer.terms(body)
        if not terms:
            return None
        return FuzzyQuery(terms[0], max_edits=max_edits, field=field, boost=boost)

    def _phrase(self, text: str, slop: int, boost: float, field: str | None = None) -> Query | None:
        toks = self.analyzer.tokenize_text(text)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(toks[0][0], field=field, boost=boost)
        return PhraseQuery(
            terms=tuple(t for t, _ in toks),
            positions=tuple(p for _, p in toks),
            slop=slop,
            field=field,
            boost=boost,
        )


def _boosted(q: Query, boost: float) -> Query:
    if boost == 1.0:
        return q
    import dataclasses

    return dataclasses.replace(q, boost=q.boost * boost)


def _with_field(q: Query, f: str) -> Query:
    """Recursively bind grouped-field syntax: set `field=f` on every leaf
    whose field is unset (explicit per-leaf field:term inside the group
    still wins, as in the classic grammar)."""
    import dataclasses

    if isinstance(q, BooleanQuery):
        return dataclasses.replace(
            q,
            clauses=tuple(
                BooleanClause(_with_field(c.query, f), c.occur) for c in q.clauses
            ),
        )
    if hasattr(q, "query"):  # BoostQuery / ConstantScoreQuery wrappers
        return dataclasses.replace(q, query=_with_field(q.query, f))
    if hasattr(q, "field") and getattr(q, "field") is None:
        return dataclasses.replace(q, field=f)
    return q
