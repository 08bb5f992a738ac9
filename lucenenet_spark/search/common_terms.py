"""CommonTermsQuery (src/Lucene.Net.Queries/CommonTermsQuery.cs).

Splits query terms by document frequency at query-build time: low-freq
terms form the REQUIRED sub-query, high-freq (stopword-ish) terms a
purely OPTIONAL one — so a frequent term can boost ranking without
forcing a scan-sized candidate set. This is exactly what protects
serving latency on stopword-heavy queries at web scale: the driving
(MUST) side is the selective postings list.

Faithful to BuildQuery (CommonTermsQuery.cs:192-258):
- cutoff: df > maxTermFrequency (absolute, when >= 1) OR
  df > ceil(maxTermFrequency * maxDoc)   [:207, both arms evaluated]
- unseen terms (df == 0) go to the low-freq query [:203]
- both non-empty -> BooleanQuery{ (high, SHOULD), (low, MUST) }
- low empty -> high-freq query alone, its clauses promoted to MUST when
  highFreqOccur != MUST and no minimum-should-match (the "prevent slow
  queries" rewrite)
- high empty -> low-freq query alone.

The df lookup costs nothing extra here: term stats are the searcher's
driver dictionary (or a pushdown scan), the same seek every scored query
already does.
"""

from __future__ import annotations

import math

from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    Occur,
    Query,
    TermQuery,
)


def common_terms_query(
    searcher,
    terms: list[str],
    max_term_frequency: float = 0.01,
    high_freq_occur: Occur = Occur.SHOULD,
    low_freq_occur: Occur = Occur.SHOULD,
    low_freq_msm: int = 0,
    high_freq_msm: int = 0,
    field: str | None = None,
    boost: float = 1.0,
) -> Query:
    """Build the rewritten query for `terms` against `searcher`'s index."""
    if high_freq_occur is Occur.MUST_NOT or low_freq_occur is Occur.MUST_NOT:
        raise ValueError("occur must be MUST or SHOULD, not MUST_NOT")
    fld = field or searcher.index.default_field
    stats = searcher._term_stats([(fld, t) for t in terms])
    max_doc = searcher.index.max_doc
    m = max_term_frequency

    low: list[str] = []
    high: list[str] = []
    for t in terms:
        df = stats.get((fld, t), (0, 0))[0]
        if df == 0:
            low.append(t)  # unseen terms stay required, as in the reference
        elif (m >= 1.0 and df > m) or (df > int(math.ceil(m * float(max_doc)))):
            high.append(t)
        else:
            low.append(t)

    def bq(ts: list[str], occur: Occur, msm: int) -> BooleanQuery:
        return BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(t, field=fld), occur) for t in ts
            ),
            minimum_should_match=msm,
        )

    if not low:
        # high-only: conjunction rewrite to prevent scan-shaped queries
        occur = (
            Occur.MUST
            if (high_freq_msm == 0 and high_freq_occur is not Occur.MUST)
            else high_freq_occur
        )
        out = bq(high, occur, high_freq_msm if occur is Occur.SHOULD else 0)
        return BooleanQuery(clauses=out.clauses, minimum_should_match=out.minimum_should_match, boost=boost)
    if not high:
        out = bq(low, low_freq_occur, low_freq_msm)
        return BooleanQuery(clauses=out.clauses, minimum_should_match=out.minimum_should_match, boost=boost)
    return BooleanQuery(
        clauses=(
            BooleanClause(bq(high, high_freq_occur, high_freq_msm), Occur.SHOULD),
            BooleanClause(bq(low, low_freq_occur, low_freq_msm), Occur.MUST),
        ),
        boost=boost,
    )
