"""Gate registry part 5: join module (parent/child block join),
classification (kNN vote + naive Bayes), span algebra completion
(SpanOr / SpanPositionRange), and deletes (pre-merge + expunged stats).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.functions import classify as fclassify
from lucenenet_spark.index.deletes import delete_by_term, expunge_deletes
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _Q, _tsc, _docs_table, gate, get_engine
from lucenenet_spark.search.joins import to_parent_block_join
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.spans import span_or_docs, span_position_range_docs


# ==========================================================================
# Parent/child block join (Lucene.Net.Join/ToParentBlockJoinQuery.cs)
# ==========================================================================
@gate(
    "block_join_max",
    """
SELECT l_orderkey AS parent,
       CAST(floor(max(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS score_q,
       CAST(count(*) AS BIGINT) AS n_children
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_orderkey
""",
)
def block_join_max(spark, sf_dir):
    """ToParentBlockJoin(ScoreMode.Max): orders scored by the max matching
    lineitem's function score (child query = returnflag filter, child score
    = revenue function query)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    children = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("parent"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("cscore"),
    )
    out = to_parent_block_join(children, "parent", "cscore", "max")
    return out.select(
        "parent",
        F.floor(F.col("score") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("score_q"),
        F.col("n_children").cast("long"),
    )


@gate(
    "block_join_avg",
    """
SELECT l_orderkey AS parent,
       CAST(floor(avg(l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS score_q
FROM lineitem WHERE l_returnflag = 'R'
GROUP BY l_orderkey
""",
)
def block_join_avg(spark, sf_dir):
    """ToParentBlockJoin(ScoreMode.Avg)."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    children = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("parent"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("cscore"),
    )
    out = to_parent_block_join(children, "parent", "cscore", "avg")
    return out.select(
        "parent",
        F.floor(F.col("score") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# Classification (Lucene.Net.Classification)
# ==========================================================================
@gate(
    "knn_classify",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, docsc AS (
  SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
  FROM (({_tsc('vector')}) UNION ALL ({_tsc('merge')}))
  GROUP BY doc_id
),
topk AS (SELECT doc_id FROM docsc ORDER BY score_q DESC, doc_id ASC LIMIT 20)
SELECT d.source, CAST(count(*) AS BIGINT) AS votes
FROM topk JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def knn_classify(spark, sf_dir):
    """KNearestNeighborClassifier: OR-query top-20 -> class vote counts
    (KNearestNeighborClassifier.cs MLT+vote shape)."""
    _, s, docs = get_engine(spark, sf_dir)
    return fclassify.knn_class_votes(s, ["vector", "merge"], docs, "source", k=20)


@gate(
    "naive_bayes",
    SQL_PRELUDE + """,
labeled AS (SELECT p.doc_id, p.term, p.tf, d.source FROM post p JOIN documents d USING (doc_id)),
cls_tokens AS (SELECT source, CAST(sum(tf) AS BIGINT) AS tokens_c FROM labeled GROUP BY source),
cls_docs AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_c FROM documents GROUP BY source),
vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM ts),
qterms AS (SELECT unnest(['vector', 'merge']) AS term),
tfc AS (
  SELECT source, term, CAST(sum(tf) AS BIGINT) AS tf_c
  FROM labeled WHERE term IN ('vector', 'merge') GROUP BY source, term
),
fullgrid AS (
  SELECT c.source, q.term, coalesce(t.tf_c, 0) AS tf_c
  FROM cls_docs c CROSS JOIN qterms q
  LEFT JOIN tfc t ON t.source = c.source AND t.term = q.term
),
ll AS (
  SELECT f.source,
         sum(ln((CAST(f.tf_c AS DOUBLE) + 1.0) / (CAST(k.tokens_c AS DOUBLE) + vocab.v))) AS ll_sum
  FROM fullgrid f JOIN cls_tokens k USING (source), vocab
  GROUP BY f.source
)
SELECT c.source,
       CAST(floor((ln(CAST(c.docs_c AS DOUBLE) / cs.n) + ll.ll_sum) * 10000 + 0.5) AS BIGINT) AS nb_q
FROM cls_docs c JOIN ll USING (source), cs
""",
)
def naive_bayes(spark, sf_dir):
    """SimpleNaiveBayesClassifier: per-class log prior + add-one-smoothed
    log likelihood of the query terms (SimpleNaiveBayesClassifier.cs)."""
    idx, _, docs = get_engine(spark, sf_dir)
    return fclassify.naive_bayes_class_scores(idx, ["vector", "merge"], docs, "source")


# ==========================================================================
# Span algebra completion (Search/Spans/)
# ==========================================================================
@gate(
    "span_or",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE term IN ('key', 'scan')
""",
)
def span_or(spark, sf_dir):
    """SpanOrQuery docset (Search/Spans/SpanOrQuery.cs)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return span_or_docs(idx, ["key", "scan"])


@gate(
    "span_position_range",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM tok WHERE term = 'table' AND pos >= 2 AND pos < 8
""",
)
def span_position_range(spark, sf_dir):
    """SpanPositionRangeQuery: term at position in [2, 8)
    (Search/Spans/SpanPositionRangeQuery.cs)."""
    idx, _, _ = get_engine(spark, sf_dir)
    return span_position_range_docs(idx, "table", 2, 8)


# ==========================================================================
# Deletes (BufferedUpdatesStream / liveDocs)
# ==========================================================================
@gate(
    "delete_by_term",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT a.doc_id, {_Q} AS score_q
FROM ({_tsc('vector')}) a
WHERE a.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
""",
)
def delete_by_term_gate(spark, sf_dir):
    """DeleteDocuments(Term) then a term query: deleted docs stop
    matching while collection stats still count them until merge
    (pre-merge Lucene semantics — scores identical to the undeleted
    index's surviving docs)."""
    idx, _, _ = get_engine(spark, sf_dir)
    live = delete_by_term(idx, "dup")
    s = IndexSearcher(live, mode="double")
    scored = s.scored(TermQuery("vector"))
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


@gate(
    "delete_expunge",
    SQL_PRELUDE + """,
dead AS (SELECT DISTINCT doc_id FROM post WHERE term = 'dup'),
post2 AS (SELECT * FROM post WHERE doc_id NOT IN (SELECT doc_id FROM dead)),
dl2 AS (SELECT * FROM dl WHERE doc_id NOT IN (SELECT doc_id FROM dead)),
ts2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf FROM post2 GROUP BY term),
cs2 AS (SELECT CAST((SELECT count(*) FROM dl2) AS DOUBLE) AS n,
               CAST((SELECT sum(dl) FROM dl2) AS DOUBLE) AS sttf)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs2.n - ts2.df + 0.5) / (ts2.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl2.dl / (cs2.sttf / cs2.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post2 p JOIN dl2 USING (doc_id) JOIN ts2 USING (term), cs2
WHERE p.term = 'vector'
""",
)
def delete_expunge_gate(spark, sf_dir):
    """ForceMergeDeletes analogue: after expunge, df/maxDoc/avgdl are
    recomputed from live docs only — scores shift accordingly."""
    idx, _, _ = get_engine(spark, sf_dir)
    merged = expunge_deletes(delete_by_term(idx, "dup"))
    s = IndexSearcher(merged, mode="double")
    scored = s.scored(TermQuery("vector"))
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# EnglishAnalyzer / PorterStemmer (Analysis/En/EnglishAnalyzer.cs:115,
# PorterStemmer.cs). The oracle embeds the stem map for the synthetic
# corpus's fixed vocabulary (stemmer correctness itself is verified by the
# published Porter fixture pairs in tests/test_round2.py).
# ==========================================================================
_CORPUS_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

_ENGINE3: dict[str, tuple] = {}


def get_engine_stemmed(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.analyzers import EnglishAnalyzer
    from lucenenet_spark.index.builder import build_index

    key = _os.path.abspath(sf_dir)
    if key not in _ENGINE3:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(docs, analyzer=EnglishAnalyzer()).cache()
        _ENGINE3[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ENGINE3[key]


def _stem_case() -> str:
    from lucenenet_spark.analysis.porter import porter_stem

    whens = " ".join(
        f"WHEN '{t}' THEN '{porter_stem(t)}'" for t in _CORPUS_VOCAB if porter_stem(t) != t
    )
    return f"CASE term {whens} ELSE term END"


def _stemmed_sql_tail(term: str) -> str:
    return f""",
tokst AS (SELECT doc_id, {_stem_case()} AS term, pos FROM tokf),
post2 AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tokst GROUP BY doc_id, term),
ts2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS ttf FROM post2 GROUP BY term)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts2.df + 0.5) / (ts2.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post2 p JOIN dl USING (doc_id) JOIN ts2 USING (term), cs
WHERE p.term = '{term}'
"""


@gate("stemmed_term_query", SQL_PRELUDE + _stemmed_sql_tail("merg"))
def stemmed_term_query(spark, sf_dir):
    """TermQuery over an EnglishAnalyzer (Porter-stemmed) index: the query
    'merg' (stem of 'merge') matches with df/scores computed on the
    stemmed vocabulary; dl/avgdl unchanged (stemming is term-renaming)."""
    _, s = get_engine_stemmed(spark, sf_dir)
    scored = s.scored(TermQuery("merg"))
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


@gate(
    "stemmed_parser_query",
    SQL_PRELUDE + _stemmed_sql_tail("queri"),
)
def stemmed_parser_query(spark, sf_dir):
    """Query-side analysis shares the stemmer (QueryBuilder runs the SAME
    analyzer as indexing): the raw string 'query' stems to 'queri' and
    matches the stemmed postings."""
    _, s = get_engine_stemmed(spark, sf_dir)
    from lucenenet_spark.queryparser.parser import QueryParser

    q = QueryParser(analyzer=s.index.analyzer).parse("query")
    scored = s.scored(q)
    return scored.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# Suggest / spell (Lucene.Net.Suggest)
# ==========================================================================
@gate(
    "prefix_suggest",
    SQL_PRELUDE + """
SELECT term, ttf AS weight FROM ts WHERE term LIKE 's%'
ORDER BY weight DESC, term ASC LIMIT 5
""",
)
def prefix_suggest_gate(spark, sf_dir):
    """AnalyzingSuggester shape: top-5 completions of 's' by collection
    frequency (Suggest/Analyzing/AnalyzingSuggester.cs)."""
    from lucenenet_spark.search.suggest import prefix_suggest

    idx, _, _ = get_engine(spark, sf_dir)
    return prefix_suggest(idx, "s", n=5)


@gate(
    "spell_correct",
    SQL_PRELUDE + """
SELECT term, df, CAST(damerau_levenshtein(term, 'tabel') AS INT) AS dist
FROM ts
WHERE term <> 'tabel' AND damerau_levenshtein(term, 'tabel') <= 1
ORDER BY dist ASC, df DESC, term ASC LIMIT 5
""",
)
def spell_correct_gate(spark, sf_dir):
    """DirectSpellChecker: 'tabel' -> 'table' (transposition = 1 edit),
    ranked (dist, df desc, term) (Spell/DirectSpellChecker.cs)."""
    from lucenenet_spark.search.suggest import spell_suggest

    idx, _, _ = get_engine(spark, sf_dir)
    return spell_suggest(idx, "tabel", n=5, max_edits=1)


# ==========================================================================
# Event-time streaming ops (beyond reference; Structured Streaming surface).
# Gates check the batch-mode plans; the streaming path (watermark +
# applyInPandasWithState) is exercised by tests/test_streaming_windows.py,
# which asserts stream output == these batch plans on the same input.
# ==========================================================================
@gate(
    "windowed_event_counts",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ws,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(floor(sum(value) * 100 + 0.5) AS BIGINT) AS value_sum_q
FROM events GROUP BY 1, 2
""",
)
def windowed_event_counts_gate(spark, sf_dir):
    """Tumbling 1h event-time window counts + quantized value sums —
    identical plan serves the watermarked stream."""
    from lucenenet_spark.streaming.windows import windowed_event_counts

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = windowed_event_counts(ev, "1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        "event_type",
        F.col("cnt").cast("long"),
        "value_sum_q",
    )


@gate(
    "sessionize",
    """
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) AS sno
  FROM m
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sno
""",
)
def sessionize_gate(spark, sf_dir):
    """30-min-gap sessionization (gaps-and-islands batch plan; the
    streaming twin is applyInPandasWithState)."""
    from lucenenet_spark.streaming.windows import sessionize

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    out = sessionize(ev, gap_minutes=30)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.col("n_events").cast("long"),
    )


# ==========================================================================
# Language-model similarities (Search/Similarities/LMDirichletSimilarity.cs,
# LMJelinekMercerSimilarity.cs) behind the Similarity seam. cp is float32
# (LMStats.CollectionProbability is a float field) -> CAST(... AS FLOAT)
# in the oracle.
# ==========================================================================
@gate(
    "lm_dirichlet_term",
    SQL_PRELUDE + """
SELECT p.doc_id,
       CAST(floor(
         greatest(
           1.0 * (ln(1 + p.tf / (2000.0 * CAST(CAST(ts.ttf + 1 AS FLOAT) / CAST(cs.sttf + 1 AS FLOAT) AS FLOAT)))
                  + ln(2000.0 / (dl.dl + 2000.0))),
           0.0
         ) * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = 'vector'
""",
)
def lm_dirichlet_term(spark, sf_dir):
    """TermQuery under LMDirichletSimilarity (mu=2000), clamped at 0."""
    from lucenenet_spark.search.lm import LMSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = LMSearcher(idx, model="dirichlet", mode="double")
    return s.scored(TermQuery("vector")).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


@gate(
    "lm_jm_bool_or",
    SQL_PRELUDE + """,
parts AS (
  SELECT p.doc_id,
         1.0 * ln(1 + ((0.9 * p.tf / dl.dl) / (0.1 * CAST(CAST(ts.ttf + 1 AS FLOAT) / CAST(cs.sttf + 1 AS FLOAT) AS FLOAT)))) AS part
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term IN ('vector', 'merge')
)
SELECT doc_id, CAST(floor(sum(part) * 10000 + 0.5) AS BIGINT) AS score_q
FROM parts GROUP BY doc_id
""",
)
def lm_jm_bool_or(spark, sf_dir):
    """Boolean OR under LMJelinekMercer (lambda=0.1): additive
    (SimilarityBase coord/queryNorm identity)."""
    from lucenenet_spark.search.lm import LMSearcher
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    idx, _, _ = get_engine(spark, sf_dir)
    s = LMSearcher(idx, model="jm", lam=0.1, mode="double")
    q = BooleanQuery.of(
        (TermQuery("vector"), Occur.SHOULD), (TermQuery("merge"), Occur.SHOULD)
    )
    return s.scored(q).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# Query-time synonym expansion (SynonymFilter pattern -> OR / MultiPhrase)
# ==========================================================================
@gate(
    "synonym_or",
    SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ((SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score FROM sc WHERE term = 'fast')
      UNION ALL
      (SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score FROM sc WHERE term = 'slow'))
GROUP BY doc_id
""",
)
def synonym_or(spark, sf_dir):
    """TermQuery('fast') expanded through {'fast': ['slow']} -> OR."""
    from lucenenet_spark.analysis.synonyms import expand_synonyms
    from lucenenet_spark.plans.gate import _spark_score_q

    _, s, _ = get_engine(spark, sf_dir)
    q = expand_synonyms(TermQuery("fast"), {"fast": ["slow"]})
    return _spark_score_q(s.scored(q))


@gate(
    "synonym_phrase",
    SQL_PRELUDE + """,
mpf AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS freq
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN ('big', 'small') AND b.term = 'data'
  GROUP BY a.doc_id
),
midfs AS (
  SELECT ((SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'big')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'small')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'data')) AS idf
)
SELECT mpf.doc_id,
       CAST(floor((midfs.idf * 2.2 * mpf.freq /
             (mpf.freq + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
       AS score_q
FROM mpf JOIN dl USING (doc_id), midfs, cs
""",
)
def synonym_phrase(spark, sf_dir):
    """PhraseQuery('big data') expanded through {'big': ['small']} ->
    MultiPhraseQuery with per-slot alternatives (idf summed over every
    slot term, but note: the engine's multi-phrase sums idf over slot-0
    alternatives in slot order big,small then data)."""
    from lucenenet_spark.analysis.synonyms import expand_synonyms
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import PhraseQuery

    _, s, _ = get_engine(spark, sf_dir)
    q = expand_synonyms(PhraseQuery(terms=("big", "data")), {"big": ["small"]})
    return _spark_score_q(s.scored(q))


# ==========================================================================
# Inventory completion: RegexpQuery, SpanNot, DrillSideways as first-class
# oracle-checked gates (previously pytest-only / covered-by-proxy)
# ==========================================================================
@gate(
    "regexp_query",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE regexp_matches(term, '^gro.p$')
""",
)
def regexp_query(spark, sf_dir):
    """RegexpQuery (anchored, Search/RegexpQuery.cs) as a term-dictionary
    automaton -> pushdown rlike."""
    from lucenenet_spark.search.queries import RegexpQuery

    _, s, _ = get_engine(spark, sf_dir)
    return s.docset(RegexpQuery("gro.p"))


@gate(
    "span_not",
    SQL_PRELUDE + """,
inc AS (
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'key' AND b.term = 'agg'
),
overlap AS (
  SELECT DISTINCT i.doc_id
  FROM tok i JOIN tok e ON e.doc_id = i.doc_id
  WHERE i.term = 'key' AND e.term = 'dup'
    AND e.pos >= i.pos - 2 AND e.pos <= i.pos + 1 + 2
)
SELECT doc_id FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM overlap)
""",
)
def span_not_gate(spark, sf_dir):
    """SpanNotQuery: 'key agg' spans minus docs where 'dup' falls within
    2 positions of a 'key' occurrence (Search/Spans/SpanNotQuery.cs)."""
    from lucenenet_spark.search.spans import span_not_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return span_not_docs(idx, ["key", "agg"], "dup", slop=0, dist=2)


@gate(
    "drill_sideways_source",
    SQL_PRELUDE + """
SELECT d.source, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'vector') m
JOIN documents d USING (doc_id)
WHERE d.lang = 'en'
GROUP BY d.source
""",
)
def drill_sideways_source(spark, sf_dir):
    """DrillSideways (Facet/DrillSideways.cs): source-dimension counts with
    every OTHER drilldown filter applied (lang='en') but its own removed."""
    from lucenenet_spark.search.collectors import drill_sideways

    _, s, docs = get_engine(spark, sf_dir)
    out = drill_sideways(s, TermQuery("vector"), docs, {"source": "src3", "lang": "en"})
    return out["source"]


@gate(
    "dfr_pl2_term",
    SQL_PRELUDE + """,
consts AS (
  SELECT CAST(CAST(cs.sttf AS FLOAT) / cs.n AS FLOAT) AS avg, cs.n AS n FROM cs
)
SELECT p.doc_id,
       CAST(floor(
         (1.0 * (tfn * log2(tfn / lam)
                 + (lam + 1.0 / (12.0 * tfn) - tfn) * 1.4426950408889634
                 + 0.5 * log2(6.283185307179586 * tfn))
              * (1.0 / (tfn + 1.0))) * 10000 + 0.5) AS BIGINT) AS score_q
FROM (
  SELECT p.doc_id,
         p.tf * log2(1 + 1.0 * consts.avg / dl.dl) AS tfn,
         CAST(CAST(1 + ts.ttf AS FLOAT) / CAST(1 + consts.n AS FLOAT) AS FLOAT) AS lam
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), consts
  WHERE p.term = 'vector'
) p
""",
)
def dfr_pl2_term(spark, sf_dir):
    """TermQuery under DFR PL2 (BasicModelP + AfterEffectL +
    NormalizationH2; Search/Similarities/DFRSimilarity.cs)."""
    from lucenenet_spark.search.lm import LMSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = LMSearcher(idx, model="pl2", mode="double")
    return s.scored(TermQuery("vector")).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
