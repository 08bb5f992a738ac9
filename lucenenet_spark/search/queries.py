"""Immutable Query AST — the logical IR of the engine.

Mirrors the reference Query class hierarchy (src/Lucene.Net/Search/Query.cs
and subclasses); the planner (searcher.py) compiles these to DataFrame
pipelines the way Weight/Scorer compile to docID iterators.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


@dataclass(frozen=True)
class Query:
    """Base query. `boost` multiplies the scores of this subtree
    (Query.cs Boost property; folded into the term weight like
    BM25Stats.Normalize: weight = idf * queryBoost * topLevelBoost)."""

    boost: float = field(default=1.0, kw_only=True)


class Occur(str, Enum):
    """BooleanClause.Occur (src/Lucene.Net/Search/BooleanClause.cs)."""

    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class TermQuery(Query):
    """Docs containing `term` in `field`, BM25-scored
    (reference: src/Lucene.Net/Search/TermQuery.cs:64,184-188).
    `field=None` means the searcher's default field — the atomic query
    unit is Term=(field, bytes) per src/Lucene.Net/Index/Term.cs:34."""

    term: str
    field: str | None = None


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact/sloppy phrase (src/Lucene.Net/Search/PhraseQuery.cs:169).

    `positions` are the within-phrase positions of each term — they keep
    stopword holes exactly like PhraseQuery.Add(term, position) driven by
    QueryBuilder.CreateFieldQuery (Util/QueryBuilder.cs:121-170). Default:
    consecutive 0..n-1.
    """

    terms: tuple[str, ...]
    positions: tuple[int, ...] | None = None
    slop: int = 0
    field: str | None = None

    def resolved_positions(self) -> tuple[int, ...]:
        return self.positions if self.positions is not None else tuple(range(len(self.terms)))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with per-slot term alternatives
    (src/Lucene.Net/Search/MultiPhraseQuery.cs): term_arrays[i] is the set
    of acceptable terms at phrase slot i; a doc matches when some choice of
    one term per slot forms a phrase. Scored like PhraseQuery on the union
    phrase frequency, with the weight built from the summed idf of ALL
    terms in all slots (MultiPhraseWeight ctor iterates every term)."""

    term_arrays: tuple[tuple[str, ...], ...] = ()
    positions: tuple[int, ...] | None = None
    slop: int = 0
    field: str | None = None

    def resolved_positions(self) -> tuple[int, ...]:
        return (
            self.positions
            if self.positions is not None
            else tuple(range(len(self.term_arrays)))
        )


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Synonym set scored as ONE pseudo-term (the successor engine's
    SynonymQuery, the query-side dual of index-time SynonymFilter,
    Analysis/Synonym/SynonymFilter.cs): per-doc freq = SUM of the
    members' tfs, document frequency = MAX over the members' dfs — so
    a document mentioning any spelling is scored as if one conflated
    term existed, instead of the OR-of-TermQuery score inflation where
    every variant contributes its own idf."""

    terms: tuple[str, ...] = ()
    field: str | None = None


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur = Occur.SHOULD


@dataclass(frozen=True)
class BooleanQuery(Query):
    """MUST/SHOULD/MUST_NOT composition with minimumNumberShouldMatch
    (src/Lucene.Net/Search/BooleanQuery.cs). With BM25, coord==1 and
    queryNorm==1, so the score is the plain sum of matching clause scores
    (Similarity.cs:119-140)."""

    clauses: tuple[BooleanClause, ...] = ()
    minimum_should_match: int = 0

    @staticmethod
    def of(*pairs, minimum_should_match: int = 0, boost: float = 1.0) -> "BooleanQuery":
        """BooleanQuery.of((query, Occur.MUST), ...)."""
        return BooleanQuery(
            clauses=tuple(BooleanClause(q, Occur(o)) for q, o in pairs),
            minimum_should_match=minimum_should_match,
            boost=boost,
        )


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    """All docs, constant score (src/Lucene.Net/Search/MatchAllDocsQuery.cs)."""


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Wraps a query; every matching doc scores `boost`
    (src/Lucene.Net/Search/ConstantScoreQuery.cs:77)."""

    query: Query = None  # type: ignore[assignment]


@dataclass(frozen=True)
class BoostQuery(Query):
    """Explicit boost wrapper (Query.Boost setter in the reference API)."""

    query: Query = None  # type: ignore[assignment]


class MultiTermQuery(Query):
    """Marker base: queries that rewrite against the term dictionary
    (src/Lucene.Net/Search/MultiTermQuery.cs:95-147)."""


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    """(src/Lucene.Net/Search/PrefixQuery.cs)"""

    prefix: str
    field: str | None = None


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    """`*` / `?` pattern (src/Lucene.Net/Search/WildcardQuery.cs:133)."""

    pattern: str
    field: str | None = None


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """Regex over the term dictionary (src/Lucene.Net/Search/RegexpQuery.cs)."""

    regexp: str
    field: str | None = None


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    """Lexicographic term range (src/Lucene.Net/Search/TermRangeQuery.cs)."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str | None = None


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """Damerau-Levenshtein expansion (src/Lucene.Net/Search/FuzzyQuery.cs:58;
    default maxEdits=2, prefixLength=0, transpositions=True — FuzzyQuery.cs:61
    DefaultTranspositions counts a transposition as ONE edit)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    max_expansions: int = 50
    transpositions: bool = True
    field: str | None = None


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max over subquery scores + tie_breaker * (sum - max)
    (src/Lucene.Net/Search/DisjunctionMaxQuery.cs)."""

    queries: tuple[Query, ...] = ()
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class PayloadTermQuery(Query):
    """Term query whose score folds in per-position payloads
    (src/Lucene.Net/Search/Payloads/PayloadTermQuery.cs): score =
    span score x payload function over the doc's matched payloads.
    `function` picks the reference PayloadFunction: 'avg'
    (AveragePayloadFunction.cs), 'min'/'max' (Min/MaxPayloadFunction.cs).
    include_span_score=False returns the payload aggregate alone
    (PayloadTermQuery.cs IncludeSpanScore). The span score here is the
    BM25 term kernel (this engine's Similarity seam), standing in for the
    reference's SpanScorer sloppy-freq weight."""

    term: str = ""
    field: str | None = None
    function: str = "avg"
    include_span_score: bool = True


@dataclass(frozen=True)
class NGramPhraseQuery(Query):
    """Phrase over a char-n-gram field (src/Lucene.Net/Search/
    NGramPhraseQuery.cs): for consecutive grams of one surface string,
    checking every n-th gram plus the last is RESULT-IDENTICAL to the full
    gram phrase (gram i and gram i+n pin every character between them, so
    the skipped grams are implied) — the rewrite drops ~(n-1)/n of the
    position-join terms. `terms` are the consecutive grams (positions
    0..m-1 implied); rewrite() produces the thinned PhraseQuery."""

    n: int = 2
    terms: tuple[str, ...] = ()
    field: str | None = None


def rewrite(query: Query) -> Query:
    """Logical simplification fixpoint, mirroring Query.Rewrite
    (IndexSearcher.cs:794-798; BooleanQuery.cs:539-569 one-clause collapse;
    PhraseQuery.cs:169 single-term phrase -> TermQuery)."""
    if isinstance(query, NGramPhraseQuery):
        m = len(query.terms)
        if m == 0:
            # Lucene's empty phrase/boolean rewrites match NO documents
            # (BooleanQuery with zero clauses); MatchAll here would turn a
            # degenerate empty phrase into a match-everything query.
            return BooleanQuery(clauses=(), boost=query.boost)
        # NGramPhraseQuery.Rewrite: keep grams at 0, n, 2n, ... and the
        # last; under n terms there is nothing to thin
        if query.n <= 1 or m <= query.n:
            return rewrite(PhraseQuery(
                terms=query.terms, field=query.field, boost=query.boost
            ))
        keep = [i for i in range(m) if i % query.n == 0]
        if keep[-1] != m - 1:
            keep.append(m - 1)
        return rewrite(PhraseQuery(
            terms=tuple(query.terms[i] for i in keep),
            positions=tuple(keep),
            field=query.field,
            boost=query.boost,
        ))
    if isinstance(query, PhraseQuery) and len(query.terms) == 1:
        return TermQuery(query.terms[0], field=query.field, boost=query.boost)
    if isinstance(query, MultiPhraseQuery):
        # MultiPhraseQuery.Rewrite: 1 slot of 1 term -> TermQuery; all slots
        # singleton -> plain PhraseQuery (MultiPhraseQuery.cs Rewrite)
        if len(query.term_arrays) == 1 and len(query.term_arrays[0]) == 1:
            return TermQuery(query.term_arrays[0][0], field=query.field, boost=query.boost)
        if all(len(arr) == 1 for arr in query.term_arrays):
            return PhraseQuery(
                terms=tuple(arr[0] for arr in query.term_arrays),
                positions=query.positions,
                slop=query.slop,
                field=query.field,
                boost=query.boost,
            )
    if isinstance(query, BoostQuery):
        inner = rewrite(query.query)
        return _with_boost(inner, inner.boost * query.boost)
    if isinstance(query, BooleanQuery):
        clauses = tuple(BooleanClause(rewrite(c.query), c.occur) for c in query.clauses)
        if (
            len(clauses) == 1
            and clauses[0].occur is not Occur.MUST_NOT
            and query.minimum_should_match <= 1
            and query.boost == 1.0
        ):
            # single-clause collapse (BooleanQuery.cs:539-555)
            return clauses[0].query
        return BooleanQuery(
            clauses=clauses,
            minimum_should_match=query.minimum_should_match,
            boost=query.boost,
        )
    return query


def _with_boost(q: Query, boost: float) -> Query:
    import dataclasses

    return dataclasses.replace(q, boost=boost)
