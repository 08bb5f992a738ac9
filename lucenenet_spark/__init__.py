"""lucenenet_spark — a PySpark-native full-text index + BM25 search engine.

A from-scratch reimplementation of the *capabilities* of apache/lucenenet
(Lucene 4.8 port): StandardAnalyzer tokenization, inverted-index construction
(postings with tf + positions, quantized norms), global collection statistics,
BM25 scoring (k1=1.2, b=0.75) with Lucene's exact float32 / SmallFloat-315
quantization contract, boolean / phrase / prefix / wildcard / fuzzy / range
queries, grouping, facets, and top-k collection — all expressed as PySpark
DataFrame plans so that Catalyst/Tungsten pick the physical strategy.

Designed for 10^12-document scale: postings are built with skew-free
`(term, block)` aggregation, stored sorted by term for parquet predicate
pushdown, norms are denormalized into posting rows to avoid a doc-join at
query time, and top-k uses Spark's TakeOrdered (per-partition heaps + single
reduce) mirroring IndexSearcher's leaf-slice merge
(reference: src/Lucene.Net/Search/IndexSearcher.cs:528-580).
"""

from lucenenet_spark.analysis.analyzers import EnglishAnalyzer, StandardAnalyzer, WhitespaceAnalyzer
from lucenenet_spark.analysis.classic import ClassicAnalyzer
from lucenenet_spark.analysis.worddelim import WordDelimiterAnalyzer
from lucenenet_spark.index.builder import InvertedIndex, build_index
from lucenenet_spark.index.deletes import apply_deletes, delete_by_term, expunge_deletes
from lucenenet_spark.index.splitter import split_index
from lucenenet_spark.search.block_searcher import BlockIndexSearcher
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher

__all__ = [
    "InvertedIndex",
    "build_index",
    "IndexSearcher",
    "BlockIndexSearcher",
    "StandardAnalyzer",
    "EnglishAnalyzer",
    "WhitespaceAnalyzer",
    "ClassicAnalyzer",
    "WordDelimiterAnalyzer",
    "split_index",
    "MultiPhraseQuery",
    "apply_deletes",
    "delete_by_term",
    "expunge_deletes",
    "TermQuery",
    "PhraseQuery",
    "BooleanQuery",
    "BooleanClause",
    "BoostQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermRangeQuery",
    "MatchAllDocsQuery",
    "ConstantScoreQuery",
    "DisjunctionMaxQuery",
]

__version__ = "0.1.0"
