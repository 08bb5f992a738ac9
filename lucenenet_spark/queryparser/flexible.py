"""Flexible StandardQueryParser + classic MultiFieldQueryParser front-ends.

Both are alternate surfaces over the SAME query tree the classic parser
produces (the reference's flexible pipeline parses to QueryNodes, runs a
processor chain, and builds the identical Query objects — its test suite
TestStandardQP derives from the classic QueryParserTestBase):

- ``StandardQueryParser`` ≙ Flexible/Standard/StandardQueryParser.cs:66-139
  (config surface: DefaultOperator, MultiFields, FieldsBoost,
  AllowLeadingWildcard) with the multi-field expansion performed by
  Flexible/Standard/Processors/MultiFieldQueryNodeProcessor.cs:40-103
  (each field-able leaf is CLONED once per configured field and the clones
  are OR-grouped in place).
- ``MultiFieldQueryParser`` ≙ QueryParsers/Classic/MultiFieldQueryParser.cs
  :59-150 (GetFieldQuery(null, ...) fans the leaf out across the field
  list as SHOULD clauses, applying the per-field boost map).

Spark mapping: parse once with the classic grammar (leaves keep
``field=None`` unless the syntax binds one), then a pure tree walk clones
every unbound leaf per target field.  The walk is driver-side tree
surgery on frozen dataclasses — zero extra Spark jobs; the expanded tree
executes through the ordinary IndexSearcher plans.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping, Sequence

from lucenenet_spark.analysis.analyzers import StandardAnalyzer
from lucenenet_spark.queryparser.parser import QueryParser, _with_field
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    Occur,
    Query,
    WildcardQuery,
)


def expand_multi_fields(
    q: Query,
    fields: Sequence[str],
    boosts: Mapping[str, float] | None = None,
) -> Query:
    """Clone every field-less leaf once per field, OR-grouped in place
    (MultiFieldQueryNodeProcessor.cs:40-103).  Leaves the syntax bound to
    an explicit field (``field:term`` / grouped-field) are untouched, as
    in the reference (the processor only rewrites nodes whose field is
    the sentinel default).  A per-field boost map multiplies onto the
    leaf's own boost (MultiFieldQueryParser.cs:79-86 applies
    ``boosts[field]`` to each clone; the classic ``^`` suffix then sets
    the outer boost — composition here is multiplicative, identical
    whenever at most one of the two is present)."""
    boosts = boosts or {}
    if isinstance(q, BooleanQuery):
        return dataclasses.replace(
            q,
            clauses=tuple(
                BooleanClause(expand_multi_fields(c.query, fields, boosts), c.occur)
                for c in q.clauses
            ),
        )
    if hasattr(q, "query"):  # BoostQuery / ConstantScoreQuery wrappers
        return dataclasses.replace(q, query=expand_multi_fields(q.query, fields, boosts))
    if hasattr(q, "field") and getattr(q, "field") is None:
        clones = []
        for f in fields:
            leaf = dataclasses.replace(q, field=f)
            b = float(boosts.get(f, 1.0))
            if b != 1.0:
                leaf = dataclasses.replace(leaf, boost=leaf.boost * b)
            clones.append(leaf)
        if len(clones) == 1:
            return clones[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(c, Occur.SHOULD) for c in clones)
        )
    return q


def _has_leading_wildcard(q: Query) -> bool:
    if isinstance(q, BooleanQuery):
        return any(_has_leading_wildcard(c.query) for c in q.clauses)
    if hasattr(q, "query"):
        return _has_leading_wildcard(q.query)
    if isinstance(q, WildcardQuery):
        return q.pattern[:1] in ("*", "?")
    return False


class StandardQueryParser:
    """Flexible-module front-end (StandardQueryParser.cs:66-139).

    ``parse(query, default_field=None)``: with a default field, unbound
    leaves bind to it; with ``set_multi_fields``, they fan out across the
    field list (boosted per ``set_fields_boost``).  Leading wildcards
    raise unless ``set_allow_leading_wildcard(True)`` — the reference's
    AllowLeadingWildcard config (CommonQueryParserConfiguration.cs)."""

    def __init__(self, analyzer: StandardAnalyzer | None = None):
        self.analyzer = analyzer or StandardAnalyzer()
        self._operator = "OR"
        self._multi_fields: tuple[str, ...] | None = None
        self._boosts: dict[str, float] = {}
        self._allow_leading_wildcard = False

    # ----------------------------------------------------- config surface
    def set_default_operator(self, op: str) -> None:
        if op not in ("OR", "AND"):
            raise ValueError(f"operator must be OR or AND, got {op!r}")
        self._operator = op

    def set_multi_fields(self, fields: Sequence[str]) -> None:
        self._multi_fields = tuple(fields)

    def set_fields_boost(self, boosts: Mapping[str, float]) -> None:
        self._boosts = dict(boosts)

    def set_allow_leading_wildcard(self, allow: bool) -> None:
        self._allow_leading_wildcard = bool(allow)

    # ------------------------------------------------------------- parse
    def parse(self, query: str, default_field: str | None = None) -> Query:
        q = QueryParser(default_operator=self._operator, analyzer=self.analyzer).parse(
            query
        )
        if not self._allow_leading_wildcard and _has_leading_wildcard(q):
            raise ValueError(
                "leading wildcard not allowed "
                "(StandardQueryParser.AllowLeadingWildcard is false)"
            )
        if default_field is not None:
            return _with_field(q, default_field)
        if self._multi_fields is not None:
            return expand_multi_fields(q, self._multi_fields, self._boosts)
        return q


class MultiFieldQueryParser:
    """Classic MultiFieldQueryParser.cs:59-150: every unbound leaf expands
    across ``fields`` as SHOULD clauses with the per-field boost map."""

    def __init__(
        self,
        fields: Sequence[str],
        analyzer: StandardAnalyzer | None = None,
        boosts: Mapping[str, float] | None = None,
        default_operator: str = "OR",
    ):
        self.fields = tuple(fields)
        self.analyzer = analyzer or StandardAnalyzer()
        self.boosts = dict(boosts or {})
        self.default_operator = default_operator

    def parse(self, query: str) -> Query:
        q = QueryParser(
            default_operator=self.default_operator, analyzer=self.analyzer
        ).parse(query)
        return expand_multi_fields(q, self.fields, self.boosts)

    @staticmethod
    def parse_per_field(
        queries: Sequence[str],
        fields: Sequence[str],
        analyzer: StandardAnalyzer | None = None,
    ) -> Query:
        """Parse(string[] queries, string[] fields, Analyzer) — one query
        string per field, combined SHOULD (MultiFieldQueryParser.cs:171-199)."""
        if len(queries) != len(fields):
            raise ValueError("queries.Length != fields.Length")
        parser = QueryParser(analyzer=analyzer or StandardAnalyzer())
        clauses = []
        for qs, f in zip(queries, fields):
            sub = _with_field(parser.parse(qs), f)
            clauses.append(BooleanClause(sub, Occur.SHOULD))
        return BooleanQuery(clauses=tuple(clauses))

    @staticmethod
    def parse_with_flags(
        query: str,
        fields: Sequence[str],
        flags: Sequence[Occur],
        analyzer: StandardAnalyzer | None = None,
    ) -> Query:
        """Parse(string query, string[] fields, Occur[] flags, Analyzer) —
        the whole query bound per field with that field's occur flag
        (MultiFieldQueryParser.cs:228-262)."""
        if len(fields) != len(flags):
            raise ValueError("fields.Length != flags.Length")
        parser = QueryParser(analyzer=analyzer or StandardAnalyzer())
        clauses = []
        for f, occ in zip(fields, flags):
            sub = _with_field(parser.parse(query), f)
            clauses.append(BooleanClause(sub, occ))
        return BooleanQuery(clauses=tuple(clauses))
