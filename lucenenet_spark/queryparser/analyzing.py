"""AnalyzingQueryParser: classic parser whose wildcard / prefix / fuzzy
terms go THROUGH the analyzer instead of being merely lower-cased.

Reference: src/Lucene.Net.QueryParser/Analyzing/AnalyzingQueryParser.cs
(GetWildcardQuery:74-116 splits the pattern into maximal chunks between
'*'/'?' wildcards and analyzes each chunk in place; GetPrefixQuery:135
analyzes the whole body then re-appends '*'; GetFuzzyQuery:153 analyzes
the term; AnalyzeSingleChunk:170-215 requires the analyzer to return
EXACTLY one token per chunk — zero tokens or a multi-token expansion is
a parse error).

With a stemming analyzer the practical effect is that ``Merge*`` parses
to ``PrefixQuery("merg")`` — matching the stemmed index vocabulary —
where the classic parser would emit ``PrefixQuery("merge")`` and miss
every document whose surface form stemmed to ``merg``.
"""

from __future__ import annotations

import re

from lucenenet_spark.queryparser.parser import QueryParser, _unescape
from lucenenet_spark.search.queries import FuzzyQuery, PrefixQuery, Query, WildcardQuery

# maximal runs of non-wildcard text (chunks) between '*' / '?' wildcards
_CHUNK = re.compile(r"[^*?]+|[*?]")


class AnalyzingQueryParser(QueryParser):
    def _analyze_single_chunk(self, chunk: str) -> str:
        """AnalyzeSingleChunk: the chunk must analyze to exactly one token."""
        toks = self.analyzer.terms(_unescape(chunk))
        if not toks:
            raise ValueError(f'Analyzer returned nothing for "{chunk}"')
        if len(toks) > 1:
            raise ValueError(f'Analyzer created multiple terms for "{chunk}": {toks}')
        return toks[0]

    def _get_prefix_query(self, body: str, field: str | None, boost: float) -> Query:
        return PrefixQuery(self._analyze_single_chunk(body), field=field, boost=boost)

    def _get_wildcard_query(self, w: str, field: str | None, boost: float) -> Query:
        out = []
        for piece in _CHUNK.findall(w):
            out.append(piece if piece in ("*", "?") else self._analyze_single_chunk(piece))
        return WildcardQuery("".join(out), field=field, boost=boost)

    def _get_fuzzy_query(
        self, body: str, max_edits: int, field: str | None, boost: float
    ) -> Query:
        return FuzzyQuery(
            self._analyze_single_chunk(body), max_edits=max_edits, field=field, boost=boost
        )
