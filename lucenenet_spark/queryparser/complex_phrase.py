"""ComplexPhraseQueryParser: wildcard/fuzzy terms INSIDE phrases.

Reference: QueryParser/ComplexPhrase/ComplexPhraseQueryParser.cs (~400 LoC):
a phrase like "(john jon) smyth*"~2 is parsed with the classic grammar, then
each embedded leaf is rewritten into span form — MultiTermQuery leaves become
SpanMultiTermQueryWrapper clauses, plain terms SpanTermQuery — and the phrase
becomes SpanNearQuery(slop, inOrder: slop == 0)  (ComplexPhraseQueryParser.cs
ComplexPhraseQuery.Rewrite: "inOrder" is true only for slop 0).

Spark-first: each slot compiles to a term-dictionary PREDICATE pushed to the
postings scan (no driver-side term expansion), per-slot position unions are
joined with the ordered/unordered window predicates of the span module.
Grammar subset: whitespace-separated slots inside one quoted phrase, a slot
being  term | prefix* | wild?card | (alt1 alt2 ...) ;  trailing ~N sets slop.
Fuzzy-in-phrase (term~k) is resolved through the same Damerau rewrite the
top-level FuzzyQuery uses, then treated as an alternatives group.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.queries import (
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.search.spans import span_near_pattern_docs

_PHRASE = re.compile(r'^\s*"(?P<body>.*)"\s*(?:~(?P<slop>\d+))?\s*$', re.S)


def parse_complex_phrase(s: str):
    """-> (slots, slop); each slot is a term str, a MultiTermQuery, or a
    list of alternatives (terms / MultiTermQueries)."""
    m = _PHRASE.match(s)
    if not m:
        raise ValueError(f"not a quoted phrase: {s!r}")
    slop = int(m.group("slop") or 0)
    body = m.group("body")
    slots: list = []
    i, n = 0, len(body)
    while i < n:
        if body[i].isspace():
            i += 1
            continue
        if body[i] == "(":
            j = body.index(")", i)
            alts = [_leaf(w) for w in body[i + 1 : j].split()]
            slots.append(alts)
            i = j + 1
        else:
            j = i
            while j < n and not body[j].isspace():
                j += 1
            slots.append(_leaf(body[i:j]))
            i = j
    if len(slots) < 2:
        raise ValueError("complex phrase needs >= 2 slots")
    return slots, slop


def _leaf(w: str):
    w = w.lower()
    fm = re.match(r"^(?P<t>[^~]+)~(?P<k>\d?)$", w)
    if fm:
        return FuzzyQuery(term=fm.group("t"), max_edits=int(fm.group("k") or 2))
    if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
        return PrefixQuery(prefix=w[:-1])
    if "*" in w or "?" in w:
        return WildcardQuery(pattern=w)
    return w


def complex_phrase_docs(
    index: InvertedIndex, phrase: str, field: str | None = None
) -> DataFrame:
    """Docs matching the complex phrase (constant-score docset, the shape
    ComplexPhraseQuery exposes through its span rewrite)."""
    slots, slop = parse_complex_phrase(phrase)
    resolved = [_resolve(index, s, field) for s in slots]
    return span_near_pattern_docs(
        index, resolved, slop=slop, in_order=(slop == 0), field=field
    )


def _resolve(index: InvertedIndex, slot, field):
    """Fuzzy slots go through the searcher's Damerau rewrite (bounded
    driver-side candidate list, same as top-level FuzzyQuery); alternative
    groups become a single regexp predicate (union automaton)."""
    from lucenenet_spark.search.queries import BooleanQuery, RegexpQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    def fuzzy_terms(fq: FuzzyQuery) -> list[str]:
        s = IndexSearcher(index)
        rw = s._rewrite_fuzzy(fq)
        if isinstance(rw, BooleanQuery):
            return [c.query.query.term if hasattr(c.query, "query") else c.query.term
                    for c in rw.clauses]
        q = rw
        while hasattr(q, "query"):
            q = q.query
        return [q.term] if isinstance(q, TermQuery) else []

    if isinstance(slot, list):
        pats = []
        for a in slot:
            if isinstance(a, FuzzyQuery):
                pats.extend(re.escape(t) for t in fuzzy_terms(a))
            elif isinstance(a, PrefixQuery):
                pats.append(re.escape(a.prefix) + ".*")
            elif isinstance(a, WildcardQuery):
                pats.append(re.escape(a.pattern).replace(r"\*", ".*").replace(r"\?", "."))
            else:
                pats.append(re.escape(a))
        return RegexpQuery(regexp="|".join(pats) if pats else "$^")
    if isinstance(slot, FuzzyQuery):
        terms = fuzzy_terms(slot)
        return RegexpQuery(regexp="|".join(re.escape(t) for t in terms) if terms else "$^")
    return slot
