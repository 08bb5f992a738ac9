"""Round-4 gates: SearchAfter deep pagination, Snowball stemming (de/fr),
SimpleQueryParser. Registered into gate.GATE_QUERIES like the other gate_*
modules; every entry carries a full DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _Q,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)
from lucenenet_spark.search.queries import TermQuery


# ==========================================================================
# SearchAfter deep pagination (Search/IndexSearcher.cs:297-511 +
# TopScoreDocCollector.cs:84-148 paging collector, tie-break :112-114):
# page 2 of term_query_topk — hits strictly after page 1's last (score,
# doc) in (score DESC, doc_id ASC) order, WITHOUT re-collecting page 1.
# ==========================================================================
@gate(
    "search_after",
    SQL_PRELUDE + "," + _SQL_SCORED + f""",
sc1 AS ({_tsc('vector')}),
aft AS (
  SELECT score AS a_score, doc_id AS a_doc
  FROM (SELECT * FROM sc1 ORDER BY score DESC, doc_id ASC LIMIT 10)
  ORDER BY score ASC, doc_id DESC LIMIT 1
)
SELECT doc_id, {_Q} AS score_q
FROM sc1, aft
WHERE score < a_score OR (score = a_score AND doc_id > a_doc)
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
)
def search_after(spark, sf_dir):
    """Page 2 via IndexSearcher.search_after: the keyset predicate
    (score < after.score) OR (score = after.score AND doc_id > after.doc)
    composed into the same single-job top-k plan — deterministic because
    both engines compute the double score with the identical expression."""
    _, s, _ = get_engine(spark, sf_dir)
    q = TermQuery("vector")
    page1 = s.search(q, 10).collect()
    last = page1[-1]
    out = s.search_after((float(last["score"]), int(last["doc_id"])), q, 10)
    return _spark_score_q(out)


# ==========================================================================
# Snowball stemming routed by the corpus `lang` column
# (Analysis/Snowball/SnowballFilter.cs wired as in De/GermanAnalyzer.cs and
# Fr/FrenchAnalyzer.cs; routing is the Spark-first analogue of running
# per-language IndexWriters over a partitioned corpus). The oracle
# reproduces the per-language stop filter + stemmer on the pinned corpus
# vocabulary (stemmer fidelity itself is pinned by the rule-traced fixture
# pairs in tests/test_snowball.py).
# ==========================================================================
_ROUTED_ENGINE: dict[str, tuple] = {}


def get_engine_routed(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import (
        FrenchAnalyzer,
        GermanAnalyzer,
        LanguageRoutedAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        router = LanguageRoutedAnalyzer(
            {"de": GermanAnalyzer(), "fr": FrenchAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_ENGINE[key]


def _lang_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball import french_stem, german_stem
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    de = " ".join(
        f"WHEN '{t}' THEN '{german_stem(t)}'"
        for t in _CORPUS_VOCAB if german_stem(t) != t
    )
    fr = " ".join(
        f"WHEN '{t}' THEN '{french_stem(t)}'"
        for t in _CORPUS_VOCAB if french_stem(t) != t
    )
    return (
        f"CASE WHEN lang = 'de' THEN (CASE term {de} ELSE term END) "
        f"WHEN lang = 'fr' THEN (CASE term {fr} ELSE term END) "
        f"ELSE term END"
    )


def _lang_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball import (
        FRENCH_STOP_WORDS,
        GERMAN_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join(
            "'" + w.replace("'", "''") + "'" for w in sorted(ws)
        )

    return (
        f"((lang = 'de' AND term NOT IN ({lst(GERMAN_STOP_WORDS)})) OR "
        f"(lang = 'fr' AND term NOT IN ({lst(FRENCH_STOP_WORDS)})) OR "
        f"(lang NOT IN ('de', 'fr') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


_SNOWBALL_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tokf AS (
  SELECT doc_id, {_lang_stem_sql()} AS term
  FROM tok
  WHERE term <> '' AND {_lang_stop_sql()}
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = 'merg'
"""


@gate("snowball_term_query", _SNOWBALL_SQL)
def snowball_term_query(spark, sf_dir):
    """TermQuery('merg') over the lang-routed index: German and French
    documents stem 'merge' -> 'merg' (Snowball de/fr both strip the final
    e), so only de/fr docs match — with df/dl/avgdl reflecting each
    language's own stop list (de/fr keep English stopwords like 'a'/'the'
    as real terms, lengthening those docs)."""
    _, s = get_engine_routed(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


# ==========================================================================
# SimpleQueryParser (QueryParser/Simple/SimpleQueryParser.cs): the lenient
# human-entered syntax — phrase | prefix with negation, composed to the
# same pushed-down docset plans the hand-built queries use.
# ==========================================================================
@gate(
    "simple_parser",
    SQL_PRELUDE + """
SELECT DISTINCT m.doc_id FROM (
  SELECT a.doc_id
  FROM tokf a JOIN tokf b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'key' AND b.term = 'agg'
  UNION
  SELECT doc_id FROM post WHERE term LIKE 'tabl%'
) m
WHERE m.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
""",
)
def simple_parser(spark, sf_dir):
    """Docset of `"key agg" | tabl* -dup`: (exact phrase OR prefix
    expansion) minus the negated term — parsed by the never-throws
    SimpleQueryParser and executed as one composed boolean plan."""
    from lucenenet_spark.queryparser.simple import SimpleQueryParser

    _, s, _ = get_engine(spark, sf_dir)
    q = SimpleQueryParser(analyzer=s.index.analyzer).parse('"key agg" | tabl* -dup')
    return s.docset(q)


# ==========================================================================
# CommonGrams (Analysis.Common/Analysis/CommonGrams/CommonGramsFilter.cs +
# CommonGramsQueryFilter.cs): stopword phrases become gram-term lookups.
# ==========================================================================
_CG_ENGINE: dict[str, tuple] = {}


def get_engine_common_grams(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.analyzers import CommonGramsAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _CG_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(docs, analyzer=CommonGramsAnalyzer()).cache()
        _CG_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _CG_ENGINE[key]


@gate(
    "common_grams_phrase",
    """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokne AS (SELECT * FROM tok WHERE term <> ''),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokne GROUP BY doc_id) x USING (doc_id)
),
gp AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tokne a JOIN tokne b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'the' AND b.term = 'merge'
  GROUP BY a.doc_id
),
ts AS (SELECT CAST(count(*) AS BIGINT) AS df FROM gp),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokne) AS DOUBLE) AS sttf
)
SELECT gp.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * gp.tf
             / (gp.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM gp JOIN dl USING (doc_id), ts, cs
""",
)
def common_grams_phrase(spark, sf_dir):
    """Phrase "the merge" through the CommonGramsQueryFilter: ONE gram
    TermQuery('the_merge') instead of a position join against the
    corpus-wide 'the' posting list; unigrams all survive (no stop
    removal), so dl/avgdl count every token."""
    idx, s = get_engine_common_grams(spark, sf_dir)
    qt = idx.analyzer.query_terms("the merge")
    assert len(qt) == 1, qt
    return _spark_score_q(s.scored(TermQuery(qt[0][0])))


# ==========================================================================
# NGramPhraseQuery over a char-n-gram field (Search/NGramPhraseQuery.cs):
# every-n-th-gram thinning, result-identical to the full gram phrase.
# ==========================================================================
_CN_ENGINE: dict[str, tuple] = {}


def get_engine_char_ngram(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.analyzers import CharNGramAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _CN_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(docs, analyzer=CharNGramAnalyzer(n=2)).cache()
        _CN_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _CN_ENGINE[key]


@gate(
    "ngram_phrase_query",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT DISTINCT doc_id FROM tok WHERE term LIKE '%vector%'
""",
)
def ngram_phrase_query(spark, sf_dir):
    """Substring search 'vector' on the bigram field: NGramPhraseQuery
    thins the 5-gram phrase to grams (0,2,4) — a doc matches iff some
    token CONTAINS 'vector' (grams at i and i+n pin the chars between, so
    the thinned phrase equals the full one)."""
    from lucenenet_spark.search.queries import NGramPhraseQuery

    idx, s = get_engine_char_ngram(spark, sf_dir)
    grams = tuple(idx.analyzer.grams("vector"))
    return s.docset(NGramPhraseQuery(n=2, terms=grams))


# ==========================================================================
# NRT streaming top-k (SearcherManager.MaybeRefresh over IncrementalIndexer
# segments; streaming/incremental.py is the foreachBatch sink — the gate
# drives its exact batch twin: 3 micro-batches -> segments -> tiered merge
# -> refresh -> search, with globally recomputed stats).
# ==========================================================================
_NRT_ENGINE: dict[str, object] = {}


def get_engine_nrt(spark, sf_dir):
    import os as _os
    import tempfile

    from pyspark.sql import functions as _F

    from lucenenet_spark.search.searcher import IndexSearcher
    from lucenenet_spark.streaming.incremental import IncrementalIndexer

    key = _os.path.abspath(sf_dir)
    if key not in _NRT_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        out = tempfile.mkdtemp(prefix="nrt_gate_")
        ix = IncrementalIndexer(out)
        for b in range(3):
            ix.process_batch(docs.filter(_F.pmod(_F.col("doc_id"), _F.lit(3)) == b), b)
        ix.maybe_merge(spark, max_segments=2, merge_factor=2)
        s = ix.refresh(spark)
        _NRT_ENGINE[key] = IndexSearcher(s.index, mode="double")
    return _NRT_ENGINE[key]


@gate(
    "nrt_topk",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('merge')})
ORDER BY score_q DESC, doc_id ASC LIMIT 10
""",
)
def nrt_topk(spark, sf_dir):
    """Top-10 for TermQuery('merge') over an index built INCREMENTALLY
    (3 segment flushes + a tiered merge + refresh): identical to the
    one-shot batch oracle because refresh recomputes df/avgdl globally
    across segments (the TermContext.Build property)."""
    s = get_engine_nrt(spark, sf_dir)
    scored = _spark_score_q(s.scored(TermQuery("merge")))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(10)


# ==========================================================================
# Multi-passage PostingsHighlighter (maxPassages > 1 — the reference's
# Search/PostingsHighlight/PostingsHighlighter.cs highlights N best
# passages per doc).
# ==========================================================================
@gate(
    "multi_passage_highlight",
    """
WITH tok AS (
  SELECT doc_id, length(text) AS clen,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
woff AS (
  SELECT *, sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) - (length(tok) + 1) AS off
  FROM tok
),
w AS (SELECT *, CAST(floor(pos / 8.0) AS INT) AS win FROM woff),
wl AS (
  SELECT doc_id, win,
         CAST(min(off) AS BIGINT) AS pstart,
         sum(length(tok)) + count(*) - 1 AS plen,
         sum(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) AS f0,
         string_agg(CASE WHEN tok = 'merge' THEN '<b>' || tok || '</b>'
                         ELSE tok END, ' ' ORDER BY pos) AS snippet,
         any_value(clen) AS clen
  FROM w GROUP BY doc_id, win
),
dl AS (
  SELECT doc_id, sum(CASE WHEN tok = 'merge' THEN 1 ELSE 0 END) AS ttf
  FROM w GROUP BY doc_id HAVING ttf > 0
),
sc AS (
  SELECT wl.doc_id, wl.pstart, wl.snippet,
         (1.0 + 1.0 / ln(87.0 + wl.pstart)) *
         (2.2 * ln(1.0 + ((1.0 + wl.clen / 87.0) + 0.5) / (dl.ttf + 0.5))
          * (wl.f0 / (wl.f0 + 1.2 * (0.25 + 0.75 * wl.plen / 87.0)))) AS score
  FROM wl JOIN dl USING (doc_id)
  WHERE wl.f0 > 0
),
q AS (
  SELECT doc_id, pstart, snippet,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC, pstart ASC) AS rn
  FROM sc
)
SELECT doc_id, pstart, score_q, snippet FROM q WHERE rn <= 2
""",
)
def multi_passage_highlight(spark, sf_dir):
    """TWO best passages per doc for TermQuery('merge') — exercises the
    passage ranking beyond the single-winner case (window choice pinned by
    the quantized score + pstart tie-break on both engines)."""
    from lucenenet_spark.search.postings_highlight import highlight_postings

    _, _, docs = get_engine(spark, sf_dir)
    out = highlight_postings(docs, ["merge"], window=8, max_passages=2)
    return out.select(
        "doc_id", F.col("pstart").cast("long").alias("pstart"), "score_q", "snippet"
    )


# ==========================================================================
# DictionaryCompoundWordTokenFilter (Analysis.Common/Analysis/Compound/):
# compounds decompose into dictionary subwords at the compound's position.
# ==========================================================================
@gate(
    "compound_word_query",
    """
SELECT DISTINCT doc_id FROM (
  SELECT doc_id,
         unnest(string_split(regexp_replace(text, 'key value', 'keyvalue', 'g'), ' ')) AS term
  FROM documents
) WHERE term IN ('value', 'keyvalue')
""",
)
def compound_word_query(spark, sf_dir):
    """Corpus fused into compounds ('key value' -> 'keyvalue'), indexed
    through CompoundWordAnalyzer({key, value}): TermQuery('value') finds
    both intact occurrences AND the decomposed compounds — the docset the
    oracle computes directly on the fused text."""
    from lucenenet_spark.analysis.analyzers import CompoundWordAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    fused = docs.select(
        "doc_id", F.regexp_replace("text", "key value", "keyvalue").alias("text")
    )
    az = CompoundWordAnalyzer(frozenset({"key", "value"}), min_word_size=6)
    idx = build_index(fused, analyzer=az)
    s = IndexSearcher(idx, mode="double")
    return s.docset(TermQuery("value"))


# ==========================================================================
# Three-language Snowball routing (de + fr + es — Analysis/Es/
# SpanishAnalyzer.cs joins the routed family)
# ==========================================================================
_ROUTED3_ENGINE: dict[str, tuple] = {}


def get_engine_routed3(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import (
        FrenchAnalyzer,
        GermanAnalyzer,
        LanguageRoutedAnalyzer,
        SpanishAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED3_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        router = LanguageRoutedAnalyzer(
            {"de": GermanAnalyzer(), "fr": FrenchAnalyzer(), "es": SpanishAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED3_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED3_ENGINE[key]


def _lang3_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball import (
        french_stem,
        german_stem,
        spanish_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)"

    return (
        f"CASE WHEN lang = 'de' THEN {case(german_stem)} "
        f"WHEN lang = 'fr' THEN {case(french_stem)} "
        f"WHEN lang = 'es' THEN {case(spanish_stem)} "
        f"ELSE term END"
    )


def _lang3_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball import (
        FRENCH_STOP_WORDS,
        GERMAN_STOP_WORDS,
        SPANISH_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    return (
        f"((lang = 'de' AND term NOT IN ({lst(GERMAN_STOP_WORDS)})) OR "
        f"(lang = 'fr' AND term NOT IN ({lst(FRENCH_STOP_WORDS)})) OR "
        f"(lang = 'es' AND term NOT IN ({lst(SPANISH_STOP_WORDS)})) OR "
        f"(lang NOT IN ('de', 'fr', 'es') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


_SNOWBALL3_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tokf AS (
  SELECT doc_id, {_lang3_stem_sql()} AS term
  FROM tok
  WHERE term <> '' AND {_lang3_stop_sql()}
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = 'merg'
"""


@gate("snowball3_term_query", _SNOWBALL3_SQL)
def snowball3_term_query(spark, sf_dir):
    """TermQuery('merg') over the THREE-language routed index: de, fr and
    es documents all stem 'merge' -> 'merg' (each by its own Snowball
    rules), each language filtered by its own stop set — one unified
    index, per-document analysis."""
    _, s = get_engine_routed3(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


# ==========================================================================
# CJKAnalyzer / CJKBigramFilter (Analysis/Cjk/): overlapping Han bigrams.
# The pinned corpus is ASCII, so the gate fuses a known adjacent pair into
# two Han characters and checks the bigram term finds exactly the docs
# that had the pair — the same corrupt/restore pattern as
# pattern_replace_term and compound_word_query.
# ==========================================================================
@gate(
    "cjk_bigram_query",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'key' AND b.term = 'value'
""",
)
def cjk_bigram_query(spark, sf_dir):
    """'key value' fused to the two-ideograph token '键值', indexed through
    CJKAnalyzer (per-char tokenize -> overlapping bigram): TermQuery on
    the bigram '键值' returns exactly the docs where the original pair was
    adjacent."""
    from lucenenet_spark.analysis.analyzers import CJKAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    fused = docs.select(
        "doc_id", F.regexp_replace("text", "key value", "键值").alias("text")
    )
    idx = build_index(fused, analyzer=CJKAnalyzer())
    s = IndexSearcher(idx, mode="double")
    return s.docset(TermQuery("键值"))
