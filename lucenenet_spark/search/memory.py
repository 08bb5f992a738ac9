"""MemoryIndex + percolation (src/Lucene.Net.Memory/MemoryIndex.cs).

The reference's MemoryIndex holds ONE document's inverted form in RAM so
an arbitrary query can be evaluated against it without touching a real
index — the classic use is percolation: match a stream of documents
against a registry of stored queries.

Spark-first shape: `percolate(docs, queries)` runs the single-doc
matcher inside an Arrow-batched mapInPandas — each executor evaluates
every registered query against each document of its partition, emitting
(doc_id, query_id) match pairs. No shuffle at all: the query registry is
a plain broadcast-sized Python structure captured by the closure, and
the output is a narrow map — the shape that keeps working when `docs`
is 10^12 rows (queries() registries are small; the document stream is
the big side and never moves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lucenenet_spark.search.queries import (
    BooleanQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    WildcardQuery,
    rewrite,
)


class MemoryIndex:
    """One document's inverted form: term -> ascending positions."""

    def __init__(self, text: str, analyzer=None):
        if analyzer is None:
            from lucenenet_spark.analysis.analyzers import StandardAnalyzer

            analyzer = StandardAnalyzer()
        self.postings: dict[str, list[int]] = {}
        for term, pos in analyzer.tokenize_text(text):
            self.postings.setdefault(term, []).append(int(pos))

    # ------------------------------------------------------------- match
    def matches(self, query: Query) -> bool:
        return self._m(rewrite(query))

    def _m(self, q: Query) -> bool:
        if isinstance(q, TermQuery):
            return q.term in self.postings
        if isinstance(q, PrefixQuery):
            return any(t.startswith(q.prefix) for t in self.postings)
        if isinstance(q, WildcardQuery):
            import fnmatch

            return any(fnmatch.fnmatchcase(t, q.pattern) for t in self.postings)
        if isinstance(q, MatchAllDocsQuery):
            return True
        if isinstance(q, PhraseQuery):
            return self._phrase_matches(q)
        if isinstance(q, BooleanQuery):
            musts = [c.query for c in q.clauses if c.occur is Occur.MUST]
            shoulds = [c.query for c in q.clauses if c.occur is Occur.SHOULD]
            nots = [c.query for c in q.clauses if c.occur is Occur.MUST_NOT]
            if any(self._m(n) for n in nots):
                return False
            if not all(self._m(m) for m in musts):
                return False
            n_should = sum(1 for s in shoulds if self._m(s))
            msm = q.minimum_should_match
            if shoulds and not musts:
                return n_should >= max(1, msm)
            return n_should >= msm
        if hasattr(q, "query"):  # Boost / ConstantScore wrappers
            return self._m(q.query)
        raise TypeError(f"MemoryIndex cannot evaluate {q!r}")

    def _phrase_matches(self, q: PhraseQuery) -> bool:
        terms = list(q.terms)
        rel = q.resolved_positions()
        adj = []
        for t, r in zip(terms, rel):
            plist = self.postings.get(t)
            if plist is None:
                return False
            adj.append({p - int(r) for p in plist})
        inter = set.intersection(*adj)
        if q.slop <= 0:
            return bool(inter)
        if inter:
            return True
        from lucenenet_spark.search.sloppy import sloppy_phrase_freq

        lists = [sorted({p - int(r) for p in self.postings[t]}) for t, r in zip(terms, rel)]
        return sloppy_phrase_freq(lists, [int(r) for r in rel], q.slop, terms=terms) > 0


def percolate(
    docs: DataFrame,
    queries: dict[str, Query],
    analyzer=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, query_id) for every (document, registered query) match."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("query_id", T.StringType(), False),
        ]
    )
    items = sorted(queries.items())

    def run(batches):
        for pdf in batches:
            ids, qids = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                mi = MemoryIndex("" if text is None else str(text), analyzer)
                for qid, q in items:
                    if mi.matches(q):
                        ids.append(int(did))
                        qids.append(qid)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"), "query_id": qids})

    return docs.select(id_col, text_col).mapInPandas(run, schema)
