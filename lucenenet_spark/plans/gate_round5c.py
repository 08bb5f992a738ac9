"""Round-5 part-4 gates: Irish + Basque routed OR query, and an
Armenian-script gate over a deterministic transliteration of the corpus.

Driver testdata carries only en/zh/es/de/fr langs and ASCII text, so:

- `snowball_gaeu_term_query` remaps langs on the fly (es->ga, fr->eu)
  like the other second-wave pack gates; the OR query pairs a term only
  the Basque stemmer produces ('mer' < 'merge') with one only the Irish
  initial_morph produces ('te' < 'the', th->t lenition), so BOTH
  languages' pipelines contribute result rows, and both contribute to
  avgdl/N in every score.
- `armenian_term_query` derives an Armenian-script corpus INSIDE the
  query on both engines: each token is transliterated through a fixed
  ASCII->Armenian letter map and given the 'ների' case ending, which the
  Snowball Armenian stemmer then strips (or not — per its own region
  rules, reproduced in the oracle's CASE map). Exercises the full
  non-Latin pipeline: UAX#29 Armenian-run tokenization, the hy stop set,
  pV/R2-limited among matching.

Stemmer fidelity is pinned separately by tests/test_snowball_misc.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import _spark_score_q, gate
from lucenenet_spark.plans.gate_round5b import _SNOWBALL_ROCA_SQL
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery

# ===========================================================================
# Irish + Basque routed index (es->ga, fr->eu)
# ===========================================================================

_ROUTED_GAEU: dict[str, tuple] = {}

_REMAP_GAEU = {"es": "ga", "fr": "eu"}


def get_engine_routed_gaeu(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_misc import (
        BasqueAnalyzer,
        IrishAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_GAEU:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        remap = F.create_map(
            *[F.lit(x) for kv in _REMAP_GAEU.items() for x in kv]
        )
        docs = docs.withColumn(
            "lang", F.coalesce(remap[F.col("lang")], F.col("lang"))
        )
        router = LanguageRoutedAnalyzer(
            {"ga": IrishAnalyzer(), "eu": BasqueAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_GAEU[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_GAEU[key]


def _gaeu_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball_misc import basque_stem, irish_stem
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    return (
        f"CASE WHEN lang2 = 'ga' THEN {case(irish_stem)} "
        f"WHEN lang2 = 'eu' THEN {case(basque_stem)} "
        f"ELSE term END"
    )


def _gaeu_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_misc import (
        BASQUE_STOP_WORDS,
        IRISH_EXTRA_STOPS,
        IRISH_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    ga = IRISH_STOP_WORDS | IRISH_EXTRA_STOPS
    return (
        f"((lang2 = 'ga' AND term NOT IN ({lst(ga)})) OR "
        f"(lang2 = 'eu' AND term NOT IN ({lst(BASQUE_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('ga', 'eu') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


def _gaeu_sql() -> str:
    sql = _SNOWBALL_ROCA_SQL.replace(
        "WHEN 'es' THEN 'ro' WHEN 'fr' THEN 'ca'",
        "WHEN 'es' THEN 'ga' WHEN 'fr' THEN 'eu'",
    )
    # OR of two terms: per-term BM25 rows summed per doc, then rounded —
    # the same DisjunctionSum shape as the boolean_or gate.
    sql = sql.replace(
        "SELECT p.doc_id,\n"
        "       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf\n"
        "             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)\n"
        "         AS score_q\n"
        "FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs\n"
        "WHERE p.term = 'merg'\n",
        "SELECT doc_id,\n"
        "       CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q\n"
        "FROM (SELECT p.doc_id,\n"
        "             (ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf\n"
        "              / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) AS score\n"
        "      FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs\n"
        "      WHERE p.term IN ('mer', 'te'))\n"
        "GROUP BY doc_id\n",
    )
    return sql.format(stem=_gaeu_stem_sql(), stop=_gaeu_stop_sql())


@gate("snowball_gaeu_term_query", _gaeu_sql())
def snowball_gaeu_term_query(spark, sf_dir):
    """OR('mer','te') over a ga/eu routed index (langs remapped es->ga,
    fr->eu): 'mer' only exists via Basque stemming of 'merge', 'te' only
    via Irish th->t lenition of 'the' (an English stop word the Irish
    stop set does NOT contain) — Analysis/{Ga,Eu} analyzer parity at
    gate granularity."""
    _, s = get_engine_routed_gaeu(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("mer"), Occur.SHOULD), (TermQuery("te"), Occur.SHOULD)
    )
    return _spark_score_q(s.scored(q))


# ===========================================================================
# Armenian over a transliterated corpus
# ===========================================================================

_HY_ASCII = "abcdefghijklmnopqrstuvwxyz"
_HY_TRANS = "աբցդեֆգհիջկլմնոպքրստւվշխյզ"
_HY_SUFFIX = "ների"

_HY_ENGINE: dict[str, tuple] = {}


def _hy_token(t: str) -> str:
    return t.translate(str.maketrans(_HY_ASCII, _HY_TRANS)) + _HY_SUFFIX


def get_engine_armenian(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball_misc import ArmenianAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _HY_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.filter(
                        F.split(F.col("text"), " "), lambda t: t != F.lit("")
                    ),
                    lambda t: F.concat(
                        F.translate(t, _HY_ASCII, _HY_TRANS), F.lit(_HY_SUFFIX)
                    ),
                ),
                " ",
            ),
        )
        idx = build_index(docs, analyzer=ArmenianAnalyzer()).cache()
        _HY_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _HY_ENGINE[key]


def _hy_sql() -> str:
    from lucenenet_spark.analysis.snowball_misc import (
        ARMENIAN_STOP_WORDS,
        armenian_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    whens = " ".join(
        f"WHEN '{_hy_token(t)}' THEN '{armenian_stem(_hy_token(t))}'"
        for t in _CORPUS_VOCAB
        if armenian_stem(_hy_token(t)) != _hy_token(t)
    )
    stem = f"(CASE term {whens} ELSE term END)" if whens else "term"
    stops = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(ARMENIAN_STOP_WORDS)
    )
    q = armenian_stem(_hy_token("merge"))
    return f"""
WITH tok AS (
  SELECT doc_id,
         translate(unnest(string_split(text, ' ')),
                   '{_HY_ASCII}', '{_HY_TRANS}') || '{_HY_SUFFIX}' AS term0
  FROM documents
  WHERE text IS NOT NULL
),
tokf AS (
  SELECT doc_id, {stem.replace("term", "term0")} AS term
  FROM tok
  WHERE term0 <> '{_HY_SUFFIX}' AND term0 NOT IN ({stops})
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
WHERE p.term = '{q}'
"""


@gate("armenian_term_query", _hy_sql())
def armenian_term_query(spark, sf_dir):
    """TermQuery over an Armenian-script corpus derived from documents
    by a fixed ASCII->Armenian transliteration + 'ների' case ending;
    the ArmenianAnalyzer (UAX#29 Armenian runs + hy stop set + Snowball
    Armenian) strips the ending per its own pV/R2 rules —
    Analysis/Hy/ArmenianAnalyzer.cs parity at gate granularity."""
    from lucenenet_spark.analysis.snowball_misc import armenian_stem

    _, s = get_engine_armenian(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery(armenian_stem(_hy_token("merge")))))


# ===========================================================================
# Turkish routed index (es->tr)
# ===========================================================================

_ROUTED_TR: dict[str, tuple] = {}


def get_engine_routed_tr(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_turkish import TurkishAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_TR:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.withColumn(
            "lang",
            F.when(F.col("lang") == "es", F.lit("tr")).otherwise(F.col("lang")),
        )
        router = LanguageRoutedAnalyzer({"tr": TurkishAnalyzer()})
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_TR[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_TR[key]


def _tr_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_turkish import (
        TURKISH_STOP_WORDS,
        turkish_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    whens = " ".join(
        f"WHEN '{t}' THEN '{turkish_stem(t)}'"
        for t in _CORPUS_VOCAB if turkish_stem(t) != t
    )
    stem = f"(CASE term {whens} ELSE term END)" if whens else "term"

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    sql = _SNOWBALL_ROCA_SQL.replace(
        "WHEN 'es' THEN 'ro' WHEN 'fr' THEN 'ca'",
        "WHEN 'es' THEN 'tr' WHEN 'fr' THEN lang",
    )
    stem_sql = f"CASE WHEN lang2 = 'tr' THEN {stem} ELSE term END"
    stop_sql = (
        f"((lang2 = 'tr' AND term NOT IN ({lst(TURKISH_STOP_WORDS)})) OR "
        f"(lang2 <> 'tr' AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )
    sql = sql.replace("WHERE p.term = 'merg'", "WHERE p.term = 'da'")
    return sql.format(stem=stem_sql, stop=stop_sql)


@gate("turkish_term_query", _tr_sql())
def turkish_term_query(spark, sf_dir):
    """TermQuery('da') over a tr routed index (langs remapped es->tr):
    'da' exists only via the Snowball Turkish noun-suffix pass stemming
    'data' (DA case ending with vowel harmony), and the tr stop set runs
    BEFORE stemming so the stop word 'da' survives as a produced term —
    Analysis/Tr/TurkishAnalyzer.cs parity at gate granularity."""
    _, s = get_engine_routed_tr(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("da")))


# ===========================================================================
# Galician (RSLP) + Brazilian routed index (es->gl, fr->br)
# ===========================================================================

_ROUTED_GLBR: dict[str, tuple] = {}


def get_engine_routed_glbr(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.brazilian import BrazilianAnalyzer
    from lucenenet_spark.analysis.rslp import GalicianAnalyzer
    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_GLBR:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        remap = F.create_map(
            *[F.lit(x) for kv in {"es": "gl", "fr": "br"}.items() for x in kv]
        )
        docs = docs.withColumn(
            "lang", F.coalesce(remap[F.col("lang")], F.col("lang"))
        )
        router = LanguageRoutedAnalyzer(
            {"gl": GalicianAnalyzer(), "br": BrazilianAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_GLBR[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_GLBR[key]


def _glbr_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.brazilian import (
        BRAZILIAN_STOP_WORDS,
        _brazilian_token_stem,
    )
    from lucenenet_spark.analysis.rslp import (
        GALICIAN_STOP_WORDS,
        galician_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    stem_sql = (
        f"CASE WHEN lang2 = 'gl' THEN {case(galician_stem)} "
        f"WHEN lang2 = 'br' THEN {case(_brazilian_token_stem)} "
        f"ELSE term END"
    )
    stop_sql = (
        f"((lang2 = 'gl' AND term NOT IN ({lst(GALICIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'br' AND term NOT IN ({lst(BRAZILIAN_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('gl', 'br') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )
    sql = _SNOWBALL_ROCA_SQL.replace(
        "WHEN 'es' THEN 'ro' WHEN 'fr' THEN 'ca'",
        "WHEN 'es' THEN 'gl' WHEN 'fr' THEN 'br'",
    )
    return sql.format(stem=stem_sql, stop=stop_sql)


@gate("rslp_glbr_term_query", _glbr_sql())
def rslp_glbr_term_query(spark, sf_dir):
    """TermQuery('merg') over a gl/br routed index (langs remapped
    es->gl, fr->br): Galician via the RSLP rule engine, Brazilian via
    the hand-written Step1-5 stripper — Analysis/Gl + Analysis/Br
    analyzer parity at gate granularity."""
    _, s = get_engine_routed_glbr(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


# ===========================================================================
# Thai over a transliterated, pair-joined corpus
# ===========================================================================

_TH_ASCII = "abcdefghijklmnopqrstuvwxyz"
_TH_TRANS = "กขคงจฉชซญดตถทนบปผฝพฟภมยรลว"

_TH_ENGINE: dict[str, tuple] = {}


def _th_token(t: str) -> str:
    return t.translate(str.maketrans(_TH_ASCII, _TH_TRANS))


def get_engine_thai(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.thai import ThaiAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _TH_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        # transliterate the whole text, then join adjacent token pairs:
        # leftmost non-overlapping '(a) (b)' -> 'ab' produces runs the
        # analyzer must re-segment via its dictionary
        docs = docs.withColumn(
            "text",
            F.regexp_replace(
                F.translate(F.col("text"), _TH_ASCII, _TH_TRANS),
                r"(\S+) (\S+)", r"$1$2",
            ),
        )
        az = ThaiAnalyzer(user_dict={_th_token(t) for t in _CORPUS_VOCAB})
        idx = build_index(docs, analyzer=az).cache()
        _TH_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _TH_ENGINE[key]


def _th_sql() -> str:
    from lucenenet_spark.analysis.thai import THAI_STOP_WORDS

    stops = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(THAI_STOP_WORDS)
    )
    q = _th_token("merge")
    return f"""
WITH tok AS (
  SELECT doc_id,
         translate(unnest(string_split(text, ' ')),
                   '{_TH_ASCII}', '{_TH_TRANS}') AS term
  FROM documents
  WHERE text IS NOT NULL
),
tokf AS (
  SELECT doc_id, term FROM tok
  WHERE term <> '' AND term NOT IN ({stops})
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
WHERE p.term = '{q}'
"""


@gate("thai_term_query", _th_sql())
def thai_term_query(spark, sf_dir):
    """TermQuery over a Thai-script corpus derived by transliterating
    documents and joining adjacent token pairs into unspaced runs; the
    ThaiAnalyzer's greedy dictionary segmentation must split every run
    back into the original token stream (the oracle is the identity
    pipeline), exercising run segmentation, positions, and the th stop
    set — Analysis/Th/ThaiAnalyzer.cs parity at gate granularity."""
    _, s = get_engine_thai(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery(_th_token("merge"))))


# ===========================================================================
# Leading wildcard via the reversed-term dictionary
# ===========================================================================

_REV_INDEX: dict[str, object] = {}


def _get_reversed(spark, sf_dir):
    import os as _os

    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.reversed import ReversedTermIndex

    key = _os.path.abspath(sf_dir)
    if key not in _REV_INDEX:
        idx, _s, _d = get_engine(spark, sf_dir)
        _REV_INDEX[key] = ReversedTermIndex(idx)
    return _REV_INDEX[key]


def _leading_wildcard_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE

    return SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE term LIKE '%rk'
"""


@gate("leading_wildcard_query", _leading_wildcard_sql())
def leading_wildcard_query(spark, sf_dir):
    """WildcardQuery('*rk') rewritten to a PrefixQuery over the
    reversed-term dictionary (ReverseStringFilter.cs pattern): the
    predicate is a pushdown-friendly startswith on rterm instead of a
    full-dictionary regex scan."""
    return _get_reversed(spark, sf_dir).docset("*rk")


# ===========================================================================
# XML query parser (CoreParser surface)
# ===========================================================================

def _xml_parser_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc

    return SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT m.doc_id,
       CAST(floor((m.score + coalesce(o.score, 0.0)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc('merge')}) m
LEFT JOIN ({_tsc('scan')}) o USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
"""


@gate("xml_parser_query", _xml_parser_sql())
def xml_parser_query(spark, sf_dir):
    """CoreParser XML front-end producing the same Query tree as the
    classic parser: a BooleanQuery with must/should/mustNot clauses
    parsed from XML elements (Xml/CoreParser.cs + Builders/*)."""
    from lucenenet_spark.plans.gate import _spark_score_q as score_q
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.queryparser.xml import CoreParser

    _, s, _ = get_engine(spark, sf_dir)
    q = CoreParser().parse("""
        <BooleanQuery fieldName="text">
          <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>scan</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>dup</TermQuery></Clause>
        </BooleanQuery>
    """)
    return score_q(s.scored(q))
