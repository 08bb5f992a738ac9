"""Span queries: position-algebra proximity matching.

Reference: Search/Spans/ (SpanTermQuery, SpanNearQuery ordered/unordered,
SpanFirstQuery, SpanNotQuery — ~2,500 LoC of iterator machinery,
NearSpansOrdered.cs / NearSpansUnordered.cs). Our mapping generalizes the
phrase position-join: explode each clause's positions, join on doc_id with
window predicates (n=2 fully declarative), or a batch matcher for n>2.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def _positions(
    index: InvertedIndex, term: str, alias: str, field: str | None = None
) -> DataFrame:
    fld = field or index.default_field
    return (
        index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
        .select("doc_id", F.explode("positions").alias(alias))
    )


def span_near_docs(
    index: InvertedIndex, terms: list[str], slop: int = 0, in_order: bool = True,
    field: str | None = None,
) -> DataFrame:
    """Docs with a span of `terms` within `slop` gaps (SpanNearQuery).

    ordered: positions strictly increasing, total width - (n-1) <= slop
    unordered: any arrangement, width - (n-1) <= slop, distinct positions

    n=2 is a pure join; n>2 chains ordered joins with a cumulative width
    bound (exact for ordered; for unordered it uses the ordered-of-sorted
    relaxation, exact for slop >= 0 window containment).
    """
    n = len(terms)
    assert n >= 2
    parts = [_positions(index, t, f"p{i}", field) for i, t in enumerate(terms)]
    if in_order:
        joined = parts[0]
        for i in range(1, n):
            joined = joined.join(parts[i], "doc_id").filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
        width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
        return joined.filter(width <= slop).select("doc_id").distinct()
    # unordered: any permutation; distinct positions; min/max window bound
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    cols = [F.col(f"p{i}") for i in range(n)]
    distinct_pos = F.size(F.array_distinct(F.array(*cols))) == n
    width = F.greatest(*cols) - F.least(*cols) - F.lit(n - 1)
    return joined.filter(distinct_pos & (width <= slop)).select("doc_id").distinct()


def span_first_docs(
    index: InvertedIndex, term: str, end: int, field: str | None = None
) -> DataFrame:
    """SpanFirstQuery: term occurs at position < end."""
    return (
        _positions(index, term, "p", field)
        .filter(F.col("p") < end)
        .select("doc_id")
        .distinct()
    )


def span_not_docs(
    index: InvertedIndex, include: list[str], exclude: str, slop: int = 0, dist: int = 0,
    field: str | None = None,
) -> DataFrame:
    """SpanNotQuery: include-span docs minus docs where the exclude term
    overlaps (within `dist` positions of) an include span."""
    fld = field or index.default_field
    inc = span_near_docs(index, include, slop=slop, in_order=True, field=fld) if len(include) > 1 else (
        index.postings.filter((F.col("field") == fld) & (F.col("term") == include[0]))
        .select("doc_id").distinct()
    )
    near_excl = _positions(index, exclude, "pe", fld)
    inc_pos = _positions(index, include[0], "pi", fld)
    overlap = (
        inc_pos.join(near_excl, "doc_id")
        .filter((F.col("pe") >= F.col("pi") - dist) & (F.col("pe") <= F.col("pi") + len(include) - 1 + dist))
        .select("doc_id")
        .distinct()
    )
    return inc.join(overlap, "doc_id", "left_anti")


def span_or_docs(index: InvertedIndex, terms: list[str], field: str | None = None) -> DataFrame:
    """SpanOrQuery over term spans: docs containing ANY of the terms
    (Search/Spans/SpanOrQuery.cs — standalone, the span union's docset)."""
    fld = field or index.default_field
    return (
        index.postings.filter((F.col("field") == fld) & (F.col("term").isin(terms)))
        .select("doc_id")
        .distinct()
    )


def span_position_range_docs(
    index: InvertedIndex, term: str, start: int, end: int, field: str | None = None
) -> DataFrame:
    """SpanPositionRangeQuery: term occurs at a position in [start, end)
    (Search/Spans/SpanPositionRangeQuery.cs; SpanFirst == start=0)."""
    return (
        _positions(index, term, "p", field)
        .filter((F.col("p") >= start) & (F.col("p") < end))
        .select("doc_id")
        .distinct()
    )


def field_masked_span_near_docs(
    index: InvertedIndex,
    term_fields: list[tuple[str, str]],
    slop: int = 0,
    in_order: bool = True,
) -> DataFrame:
    """FieldMaskingSpanQuery composition (Search/Spans/FieldMaskingSpanQuery.cs):
    each clause reads positions from its OWN field but participates in one
    proximity join as if they shared a field — the classic use case is
    matching across parallel tokenizations of the same text."""
    from functools import reduce as _reduce

    n = len(term_fields)
    assert n >= 2
    parts = [
        _positions(index, t, f"p{i}", fld) for i, (t, fld) in enumerate(term_fields)
    ]
    if in_order:
        joined = parts[0]
        for i in range(1, n):
            joined = joined.join(parts[i], "doc_id").filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
        width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
        return joined.filter(width <= slop).select("doc_id").distinct()
    joined = _reduce(lambda a, b: a.join(b, "doc_id"), parts)
    cols = [F.col(f"p{i}") for i in range(n)]
    distinct_pos = F.size(F.array_distinct(F.array(*cols))) == n
    width = F.greatest(*cols) - F.least(*cols) - F.lit(n - 1)
    return joined.filter(distinct_pos & (width <= slop)).select("doc_id").distinct()


def _slot_positions(
    index: InvertedIndex, slot, alias: str, field: str | None = None
) -> DataFrame:
    """Positions for one span slot.  `slot` is either a plain term or a
    MultiTermQuery (SpanMultiTermQueryWrapper semantics,
    Search/Spans/SpanMultiTermQueryWrapper.cs): the slot's positions are
    the UNION of positions of every dictionary term matching the pattern —
    compiled to a term-dictionary predicate pushed to the parquet scan,
    never an expanded driver-side term list."""
    from lucenenet_spark.search.queries import MultiTermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    fld = field or index.default_field
    base = index.postings.filter(F.col("field") == fld)
    if isinstance(slot, MultiTermQuery):
        pred = IndexSearcher._term_predicate(slot)
        base = base.filter(pred)
    else:
        base = base.filter(F.col("term") == slot)
    return (
        base.select("doc_id", F.explode("positions").alias(alias))
        .distinct()  # two pattern terms may share a (doc, position) slot
    )


def span_near_pattern_docs(
    index: InvertedIndex,
    slots: list,
    slop: int = 0,
    in_order: bool = True,
    field: str | None = None,
) -> DataFrame:
    """SpanNearQuery whose clauses may be SpanMultiTermQueryWrapper-wrapped
    patterns (the ComplexPhraseQueryParser / Surround execution shape):
    per-slot position unions joined with the same ordered/unordered window
    predicates as span_near_docs."""
    n = len(slots)
    assert n >= 2
    parts = [_slot_positions(index, s, f"p{i}", field) for i, s in enumerate(slots)]
    if in_order:
        joined = parts[0]
        for i in range(1, n):
            joined = joined.join(parts[i], "doc_id").filter(F.col(f"p{i}") > F.col(f"p{i-1}"))
        width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
        return joined.filter(width <= slop).select("doc_id").distinct()
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    cols = [F.col(f"p{i}") for i in range(n)]
    distinct_pos = F.size(F.array_distinct(F.array(*cols))) == n
    width = F.greatest(*cols) - F.least(*cols) - F.lit(n - 1)
    return joined.filter(distinct_pos & (width <= slop)).select("doc_id").distinct()


def _positions_with_payloads(
    index: InvertedIndex, term: str, i: int, field: str | None = None
) -> DataFrame:
    fld = field or index.default_field
    p = index.postings.filter((F.col("field") == fld) & (F.col("term") == term))
    if "payloads" not in p.columns:
        raise ValueError(
            "index has no payloads column — build with a payload-emitting "
            "analyzer (e.g. DelimitedPayloadAnalyzer)"
        )
    z = p.select(
        "doc_id",
        F.explode(F.arrays_zip("positions", "payloads")).alias("z"),
    )
    return z.select(
        "doc_id",
        F.col("z.positions").alias(f"p{i}"),
        F.col("z.payloads").cast("double").alias(f"pl{i}"),
    )


def payload_near_scores(
    index: InvertedIndex, terms: list[str], slop: int = 0,
    function: str = "avg", field: str | None = None,
) -> DataFrame:
    """PayloadNearQuery (Search/Payloads/PayloadNearQuery.cs): ordered
    span-near over `terms`, scored by the payload function accumulated
    over EVERY payload of EVERY matching span in the doc
    (PayloadNearSpanScorer.ProcessPayloads — avg = payloadsSeen-weighted
    mean; min/max over the same multiset). Returns (doc_id, score).

    The whole thing is a position join + one groupBy aggregate — no UDF,
    the same shape as span_near_docs with payloads riding along."""
    n = len(terms)
    assert n >= 2
    parts = [_positions_with_payloads(index, t, i, field) for i, t in enumerate(terms)]
    joined = parts[0]
    for i in range(1, n):
        joined = joined.join(parts[i], "doc_id").filter(
            F.col(f"p{i}") > F.col(f"p{i-1}")
        )
    width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
    spans = joined.filter(width <= slop)
    pls = [F.col(f"pl{i}") for i in range(n)]
    if function == "avg":
        score = (
            F.sum(sum(pls[1:], pls[0])) / (F.lit(float(n)) * F.count(F.lit(1)))
        )
    elif function == "min":
        score = F.min(F.least(*pls))
    elif function == "max":
        score = F.max(F.greatest(*pls))
    else:
        raise ValueError(f"unknown payload function: {function!r}")
    return spans.groupBy("doc_id").agg(score.alias("score"))


def span_near_payload_check_docs(
    index: InvertedIndex,
    terms: list[str],
    payloads_to_match: list[float],
    slop: int = 0,
    field: str | None = None,
) -> DataFrame:
    """SpanNearPayloadCheckQuery (Search/Spans/SpanNearPayloadCheckQuery.cs):
    ordered span-near over `terms` that is only accepted when the payloads
    collected at the span's positions match `payloads_to_match`.

    Faithful to AcceptPosition's ORDER-INSENSITIVE loop
    (SpanNearPayloadCheckQuery.cs:58-88 — "can't rely on order, so we need
    to compare all", each candidate payload counts as matched when it
    equals ANY required payload, acceptance = all n matched): the check
    compiles to `every pl_i IN payloads_to_match` since the candidate and
    required counts are both n. Returns the accepted docset as
    DISTINCT doc_id — the same shape as span_near_docs, the payload test
    riding the join as an extra pushed predicate (no UDF, no shuffle
    beyond the position join)."""
    n = len(terms)
    assert n >= 2 and len(payloads_to_match) == n
    required = [float(v) for v in payloads_to_match]
    parts = [_positions_with_payloads(index, t, i, field) for i, t in enumerate(terms)]
    joined = parts[0]
    for i in range(1, n):
        joined = joined.join(parts[i], "doc_id").filter(
            F.col(f"p{i}") > F.col(f"p{i-1}")
        )
    width = F.col(f"p{n-1}") - F.col("p0") - F.lit(n - 1)
    cond = width <= slop
    for i in range(n):
        cond = cond & F.col(f"pl{i}").isin(required)
    return joined.filter(cond).select("doc_id").distinct()


def span_payload_check_term_docs(
    index: InvertedIndex,
    term: str,
    payload_to_match: float,
    end: int | None = None,
    field: str | None = None,
) -> DataFrame:
    """SpanPayloadCheckQuery (Search/Spans/SpanPayloadCheckQuery.cs) over a
    single-clause span: a SpanTermQuery match (optionally position-limited
    like SpanFirstQuery via `end`) is accepted when the one payload
    collected at the matched position equals the one required payload —
    candidate and required counts are both 1, so AcceptPosition's
    compare-all loop reduces to plain equality. One exploded
    (position, payload) scan with pushed predicates, no join."""
    z = _positions_with_payloads(index, term, 0, field)
    cond = F.col("pl0") == F.lit(float(payload_to_match))
    if end is not None:
        cond = cond & (F.col("p0") < F.lit(int(end)))
    return z.filter(cond).select("doc_id").distinct()
