"""CoreParser (XML query surface) tests."""

import pytest

from lucenenet_spark.queryparser.xml import CoreParser, XmlParseError
from lucenenet_spark.search.queries import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    PayloadTermQuery,
    TermQuery,
)


def test_term_query_raw_text_and_field_inheritance():
    p = CoreParser()
    q = p.parse('<TermQuery fieldName="title">Spark</TermQuery>')
    # TermQueryBuilder does NOT analyze: raw text, case preserved
    assert q == TermQuery(term="Spark", field="title")
    # fieldName inherits through BooleanQuery/Clause
    q2 = p.parse(
        '<BooleanQuery fieldName="body">'
        '<Clause occurs="must"><TermQuery>a</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    assert q2.clauses[0].query.field == "body"


def test_boolean_query_occurs_and_msm():
    q = CoreParser().parse(
        '<BooleanQuery minimumNumberShouldMatch="2">'
        '<Clause occurs="should"><TermQuery>a</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery>b</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [
        Occur.SHOULD, Occur.SHOULD, Occur.MUST_NOT
    ]
    assert q.minimum_should_match == 2


def test_terms_query_is_analyzed():
    q = CoreParser().parse("<TermsQuery>Hello World</TermsQuery>")
    assert [c.query.term for c in q.clauses] == ["hello", "world"]
    assert all(c.occur is Occur.SHOULD for c in q.clauses)


def test_dismax_constant_score_matchall_boost():
    p = CoreParser()
    q = p.parse(
        '<DisjunctionMaxQuery tieBreaker="0.3">'
        "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
        "</DisjunctionMaxQuery>"
    )
    assert isinstance(q, DisjunctionMaxQuery) and q.tie_breaker == 0.3
    q2 = p.parse("<ConstantScoreQuery><MatchAllDocsQuery/></ConstantScoreQuery>")
    assert isinstance(q2, ConstantScoreQuery)
    assert isinstance(q2.query, MatchAllDocsQuery)
    q3 = p.parse('<TermQuery boost="2.0">x</TermQuery>')
    assert isinstance(q3, BoostQuery) and q3.boost == 2.0


def test_user_query_routes_to_classic_parser():
    q = CoreParser().parse("<UserQuery>vector AND merge</UserQuery>")
    assert isinstance(q, BooleanQuery)
    assert all(c.occur is Occur.MUST for c in q.clauses)


def test_boosting_term_query_maps_to_payload():
    q = CoreParser().parse('<BoostingTermQuery fieldName="text">k</BoostingTermQuery>')
    assert isinstance(q, PayloadTermQuery) and q.function == "avg"


def test_errors():
    p = CoreParser()
    with pytest.raises(XmlParseError):
        p.parse("<Unknown/>")
    with pytest.raises(XmlParseError):
        p.parse("not xml <<")
    with pytest.raises(XmlParseError):
        p.parse("<TermQuery>  </TermQuery>")
    with pytest.raises(XmlParseError):
        p.parse('<BooleanQuery><Clause occurs="bogus"><TermQuery>a</TermQuery></Clause></BooleanQuery>')
