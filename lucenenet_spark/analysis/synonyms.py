"""Query-time synonym expansion (the SynonymFilter's query-side pattern,
Analysis/Synonym/SynonymFilter.cs): instead of injecting synonym tokens at
index time (which would change every stored posting), expand the QUERY —
a term becomes an OR over its synonym set, and a phrase slot becomes a
MultiPhraseQuery slot with per-position alternatives (exactly what
MultiPhraseQuery exists for: "phrase with term alternatives per position",
Search/MultiPhraseQuery.cs)."""

from __future__ import annotations

import dataclasses

from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)


def expand_synonyms(q: Query, synonyms: dict[str, list[str]]) -> Query:
    """Rewrite the query tree, expanding every term through the synonym map
    (map values EXCLUDE the key itself; expansion keeps the original)."""

    def alts(t: str) -> tuple[str, ...]:
        seen: list[str] = [t]
        for s in synonyms.get(t, ()):
            if s not in seen:  # a self/duplicate synonym must not double-count
                seen.append(s)
        return tuple(seen)

    if isinstance(q, TermQuery):
        a = alts(q.term)
        if len(a) == 1:
            return q
        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(t, field=q.field), Occur.SHOULD) for t in a
            ),
            boost=q.boost,
        )
    if isinstance(q, PhraseQuery):
        arrays = tuple(alts(t) for t in q.terms)
        if all(len(a) == 1 for a in arrays):
            return q
        return MultiPhraseQuery(
            term_arrays=arrays,
            positions=q.positions,
            slop=q.slop,
            field=q.field,
            boost=q.boost,
        )
    if isinstance(q, BooleanQuery):
        return dataclasses.replace(
            q,
            clauses=tuple(
                BooleanClause(expand_synonyms(c.query, synonyms), c.occur)
                for c in q.clauses
            ),
        )
    return q
