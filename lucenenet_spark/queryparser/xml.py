"""XML query parser: the CoreParser surface over the same query tree.

Reimplements the query-element subset of
src/Lucene.Net.QueryParser/Xml/CoreParser.cs + Builders/* — an
alternate front-end producing the SAME Query objects the classic
parser produces (the reference wires both into one QueryBuilderFactory):

- <TermQuery fieldName=..>text</TermQuery> — raw text, NOT analyzed
  (TermQueryBuilder.cs:44-47); fieldName inherits from any ancestor
  (DOMUtils.GetAttributeWithInheritance).
- <TermsQuery> — text IS analyzed; each token becomes a SHOULD clause
  (TermsQueryBuilder.cs:46-66), minimumNumberShouldMatch attr.
- <BooleanQuery> with <Clause occurs="must|should|mustNot"> children
  (BooleanQueryBuilder.cs; disableCoord accepted and ignored — BM25
  coord==1), minimumNumberShouldMatch.
- <DisjunctionMaxQuery tieBreaker=..> (DisjunctionMaxQueryBuilder.cs).
- <MatchAllDocsQuery/>, <ConstantScoreQuery> (wrapped child),
- <UserQuery> — classic-parser syntax (UserInputQueryBuilder.cs).
- <BoostingTermQuery> -> PayloadTermQuery with the average function
  (BoostingTermBuilder.cs ≙ PayloadTermQuery(AveragePayloadFunction)).
- boost="x" on any element wraps the result in BoostQuery.

Span elements and filter caches are served by the span/docset APIs
directly and are not XML-routed (documented subset).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    PayloadTermQuery,
    Query,
    TermQuery,
)


class XmlParseError(ValueError):
    pass


class CoreParser:
    """Xml/CoreParser.cs analogue over ElementTree."""

    def __init__(self, default_field: str = "text", analyzer=None,
                 user_parser=None):
        self.default_field = default_field
        self.analyzer = analyzer
        self.user_parser = user_parser

    # -- public -------------------------------------------------------------

    def parse(self, xml: str) -> Query:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as e:
            raise XmlParseError(f"malformed query XML: {e}") from e
        return self._query(root, None)

    # -- helpers ------------------------------------------------------------

    @staticmethod
    def _text(e) -> str:
        return (e.text or "").strip()

    def _field(self, e, inherited: str | None) -> str | None:
        return e.get("fieldName", inherited)

    @staticmethod
    def _boost(e, q: Query) -> Query:
        b = e.get("boost")
        if b is None or float(b) == 1.0:
            return q
        return BoostQuery(boost=float(b), query=q)

    def _children(self, e):
        return [c for c in e if isinstance(c.tag, str)]

    def _analyze(self, text: str) -> list[str]:
        if self.analyzer is not None:
            return self.analyzer.terms(text)
        return [t for t in text.lower().split() if t]

    # -- element dispatch ---------------------------------------------------

    def _query(self, e, field: str | None) -> Query:
        tag = e.tag
        fn = getattr(self, f"_q_{tag}", None)
        if fn is None:
            raise XmlParseError(f"unknown query element <{tag}>")
        return self._boost(e, fn(e, self._field(e, field)))

    def _q_TermQuery(self, e, field):
        text = self._text(e)
        if not text:
            raise XmlParseError("TermQuery requires non-blank text")
        return TermQuery(term=text, field=field)

    def _q_TermsQuery(self, e, field):
        terms = self._analyze(self._text(e))
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(term=t, field=field), Occur.SHOULD)
                for t in terms
            ),
            minimum_should_match=msm,
        )

    def _q_MatchAllDocsQuery(self, e, field):
        return MatchAllDocsQuery()

    def _q_BooleanQuery(self, e, field):
        occurs = {"must": Occur.MUST, "should": Occur.SHOULD,
                  "mustNot": Occur.MUST_NOT, "mustnot": Occur.MUST_NOT}
        clauses = []
        for c in self._children(e):
            if c.tag != "Clause":
                raise XmlParseError(
                    f"BooleanQuery child must be <Clause>, got <{c.tag}>"
                )
            occ = occurs.get(c.get("occurs", "should"))
            if occ is None:
                raise XmlParseError(f"bad occurs={c.get('occurs')!r}")
            inner = self._children(c)
            if len(inner) != 1:
                raise XmlParseError("Clause must hold exactly one query")
            clauses.append(
                BooleanClause(self._query(inner[0], self._field(e, field)),
                              occ)
            )
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        return BooleanQuery(clauses=tuple(clauses),
                            minimum_should_match=msm)

    def _q_DisjunctionMaxQuery(self, e, field):
        tie = float(e.get("tieBreaker", "0.0"))
        subs = tuple(
            self._query(c, self._field(e, field)) for c in self._children(e)
        )
        return DisjunctionMaxQuery(queries=subs, tie_breaker=tie)

    def _q_ConstantScoreQuery(self, e, field):
        inner = self._children(e)
        if len(inner) != 1:
            raise XmlParseError("ConstantScoreQuery holds one child")
        return ConstantScoreQuery(query=self._query(inner[0], field))

    def _q_UserQuery(self, e, field):
        from lucenenet_spark.queryparser.parser import QueryParser

        p = self.user_parser or QueryParser(analyzer=self.analyzer)
        return p.parse(self._text(e))

    def _q_BoostingTermQuery(self, e, field):
        text = self._text(e)
        if not text:
            raise XmlParseError("BoostingTermQuery requires text")
        return PayloadTermQuery(term=text, field=field,
                                function="avg")
