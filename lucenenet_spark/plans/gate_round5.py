"""Round-5 gates: Portuguese/Italian/Dutch Snowball language packs.

The driver testdata carries only en/zh/es/de/fr langs, so the gate
deterministically REMAPS langs (es->pt, fr->it, de->nl) on the fly —
both the Spark plan and the DuckDB oracle apply the identical remap, the
same corrupt/restore pattern as cjk_bigram_query. Stemmer fidelity is
pinned separately by the rule-traced fixture pairs in
tests/test_snowball_more.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import _Q, _spark_score_q, gate
from lucenenet_spark.search.queries import TermQuery

_ROUTED_PTITNL: dict[str, tuple] = {}

_REMAP = {"es": "pt", "fr": "it", "de": "nl"}


def get_engine_routed_ptitnl(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_more import (
        DutchAnalyzer,
        ItalianAnalyzer,
        PortugueseAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_PTITNL:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        remap = F.create_map(
            *[F.lit(x) for kv in _REMAP.items() for x in kv]
        )
        docs = docs.withColumn(
            "lang", F.coalesce(remap[F.col("lang")], F.col("lang"))
        )
        router = LanguageRoutedAnalyzer(
            {"pt": PortugueseAnalyzer(), "it": ItalianAnalyzer(), "nl": DutchAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_PTITNL[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_PTITNL[key]


def _ptitnl_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball_more import (
        dutch_stem,
        italian_stem,
        portuguese_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    return (
        f"CASE WHEN lang2 = 'pt' THEN {case(portuguese_stem)} "
        f"WHEN lang2 = 'it' THEN {case(italian_stem)} "
        f"WHEN lang2 = 'nl' THEN {case(dutch_stem)} "
        f"ELSE term END"
    )


def _ptitnl_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_more import (
        DUTCH_STOP_WORDS,
        ITALIAN_STOP_WORDS,
        PORTUGUESE_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    return (
        f"((lang2 = 'pt' AND term NOT IN ({lst(PORTUGUESE_STOP_WORDS)})) OR "
        f"(lang2 = 'it' AND term NOT IN ({lst(ITALIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'nl' AND term NOT IN ({lst(DUTCH_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('pt', 'it', 'nl') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


_SNOWBALL_PTITNL_SQL = f"""
WITH docs2 AS (
  SELECT doc_id, text,
         CASE lang WHEN 'es' THEN 'pt' WHEN 'fr' THEN 'it'
                   WHEN 'de' THEN 'nl' ELSE lang END AS lang2
  FROM documents
),
tok AS (
  SELECT doc_id, lang2,
         unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id, {{stem}} AS term
  FROM tok
  WHERE term <> '' AND {{stop}}
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


def _ptitnl_sql() -> str:
    return _SNOWBALL_PTITNL_SQL.format(
        stem=_ptitnl_stem_sql(), stop=_ptitnl_stop_sql()
    )


@gate("snowball_ptitnl_term_query", _ptitnl_sql())
def snowball_ptitnl_term_query(spark, sf_dir):
    """TermQuery('merg') over a pt/it/nl routed index (langs remapped
    es->pt, fr->it, de->nl): all three languages stem 'merge' -> 'merg'
    by their own Snowball rules, each filtered by its own stop set —
    Analysis/{Pt,It,Nl} analyzer parity at gate granularity."""
    _, s = get_engine_routed_ptitnl(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


# ==========================================================================
# Japanese (Kuromoji-class) analysis: dictionary segmentation over fused
# ideographs (Lucene.Net.Analysis.Kuromoji/JapaneseAnalyzer.cs semantics at
# gate granularity). Corrupt/restore: 'key value' fused into the 4-ideograph
# compound 分散検索; JapaneseAnalyzer's user dictionary {分散, 検索}
# segments it back into two dictionary words, so TermQuery('検索') returns
# exactly the docs where the original adjacent pair occurred.
# ==========================================================================
from lucenenet_spark.plans.gate import SQL_PRELUDE, get_engine


@gate(
    "ja_analysis",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'key' AND b.term = 'value'
""",
)
def ja_analysis(spark, sf_dir):
    """'key value' fused to 分散検索, indexed through JapaneseAnalyzer
    (per-char tokenize -> greedy user-dictionary longest match): TermQuery
    on the dictionary word 検索 finds exactly the docs with the original
    adjacent pair; the particle の and bigram fallback paths are pinned by
    tests/test_round5.py."""
    from lucenenet_spark.analysis.analyzers import JapaneseAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    fused = docs.select(
        "doc_id", F.regexp_replace("text", "key value", "分散検索").alias("text")
    )
    idx = build_index(fused, analyzer=JapaneseAnalyzer(user_dict=["分散", "検索"]))
    s = IndexSearcher(idx, mode="double")
    return s.docset(TermQuery("検索"))


# ==========================================================================
# Payload queries (Search/Payloads/PayloadTermQuery.cs +
# AveragePayloadFunction.cs): every token gets a deterministic payload
# (pos % 3 + 1) via the DelimitedPayloadTokenFilter chain; the query score
# is the BM25 term kernel x the doc's average payload for that term. The
# oracle reproduces payloads arithmetically from token positions.
# ==========================================================================
_PAYLOAD_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokp AS (
  SELECT doc_id, term, pos, CAST((pos % 3) + 1 AS DOUBLE) AS payload
  FROM tok WHERE term <> ''
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, avg(payload) AS apl
  FROM tokp GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokp GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokp) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))
             * p.apl) * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = 'merge'
"""


@gate("payload_term", _PAYLOAD_SQL)
def payload_term(spark, sf_dir):
    """PayloadTermQuery('merge', avg): tokens rewritten to
    'token|((pos%3)+1)' (DelimitedPayloadTokenFilter wire format), indexed
    with payloads beside positions in the one-pass inversion; score =
    BM25 term kernel x AveragePayloadFunction over the doc's payloads, all
    in Column expressions."""
    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import PayloadTermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    # F.transform's 2-arg lambda binds the second arg to the ARRAY INDEX —
    # exactly the token position needed for the deterministic payload
    payload_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda x, i: F.concat(
                x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
            ),
        ),
        " ",
    )
    fused = docs.select("doc_id", payload_text.alias("text"))
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(PayloadTermQuery("merge", function="avg")))


# ==========================================================================
# Spatial (Lucene.Net.Spatial semantics as native lat/lon predicates).
# The corpus has no geo columns, so both sides derive deterministic
# lat/lon from doc_id with exact integer arithmetic, then filter/sort
# with the same double-precision haversine model (quantized to centi-km).
# ==========================================================================
_GEO_POINTS = """
geo AS (
  SELECT doc_id,
         CAST((doc_id * 7919) % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
         CAST((doc_id * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
  FROM documents
)
"""


def _geo_df(spark, sf_dir):
    import os as _os

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        "doc_id",
        (((F.col("doc_id") * 7919) % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
        (((F.col("doc_id") * 104729) % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
    )


@gate(
    "geo_bbox",
    "WITH " + _GEO_POINTS + """
SELECT doc_id FROM geo
WHERE lat >= 10.0 AND lat <= 60.0 AND (lon >= 170.0 OR lon <= -170.0)
""",
)
def geo_bbox(spark, sf_dir):
    """Dateline-crossing bounding box as a pushdown predicate
    (BBoxStrategy semantics): lat in [10, 60], lon wrapping 170 -> -170."""
    from lucenenet_spark.search.spatial import bbox_predicate

    geo = _geo_df(spark, sf_dir)
    return geo.filter(
        bbox_predicate("lat", "lon", 10.0, 60.0, 170.0, -170.0)
    ).select("doc_id")


@gate(
    "geo_distance_topk",
    "WITH " + _GEO_POINTS + """
SELECT doc_id,
       CAST(floor(2.0 * 6371.0088 * asin(sqrt(
         sin(radians(lat - 48.85) / 2) * sin(radians(lat - 48.85) / 2)
         + cos(radians(lat)) * cos(radians(48.85))
           * sin(radians(lon - 2.35) / 2) * sin(radians(lon - 2.35) / 2)
       )) * 100 + 0.5) AS BIGINT) AS dist_q
FROM geo
ORDER BY dist_q ASC, doc_id ASC LIMIT 10
""",
)
def geo_distance_topk(spark, sf_dir):
    """10 nearest points to (48.85, 2.35) by haversine great-circle
    distance (PointVectorStrategy distance sort), centi-km quantized."""
    from lucenenet_spark.search.spatial import geo_distance_topk as topk

    geo = _geo_df(spark, sf_dir)
    out = topk(geo, "lat", "lon", 48.85, 2.35, k=10)
    return out.select(
        "doc_id",
        F.floor(F.col("dist_km") * 100 + F.lit(0.5)).cast("long").alias("dist_q"),
    )


# ==========================================================================
# Supplementary-plane tokenization (StandardTokenizerImpl.cs handles the
# astral planes; the BMP-subset tokenizer was extended in round 5).
# Corrupt/restore: 'key value' fused into a PLANE-2 ideograph pair
# 𠮷𡃁 (U+20BB7, U+210C1) — per-char ideographic tokenization puts them
# at adjacent positions, so PhraseQuery finds exactly the original pairs.
# ==========================================================================
@gate(
    "astral_term_query",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'key' AND b.term = 'value'
""",
)
def astral_term_query(spark, sf_dir):
    """'key value' fused to the supplementary-plane pair 𠮷𡃁: the
    UAX#29 tokenizer emits one token per ideograph (now beyond the BMP),
    and PhraseQuery('𠮷','𡃁') recovers exactly the docs with the
    original adjacent pair."""
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import PhraseQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    fused = docs.select(
        "doc_id", F.regexp_replace("text", "key value", "𠮷𡃁").alias("text")
    )
    idx = build_index(fused)
    s = IndexSearcher(idx, mode="double")
    return s.docset(PhraseQuery(terms=("𠮷", "𡃁")))


# ==========================================================================
# PayloadNearQuery: ordered span over two payload-carrying terms; the score
# aggregates every payload of every matching span (PayloadNearSpanScorer).
# ==========================================================================
_PAYLOAD_NEAR_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tokp AS (
  SELECT doc_id, term, pos, CAST((pos % 3) + 1 AS DOUBLE) AS payload
  FROM tok WHERE term <> ''
),
spans AS (
  SELECT a.doc_id, a.payload AS pl_a, b.payload AS pl_b
  FROM tokp a JOIN tokp b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos - 1 <= 2
  WHERE a.term = 'key' AND b.term = 'agg'
)
SELECT doc_id,
       CAST(floor(sum(pl_a + pl_b) / (2.0 * count(*)) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM spans GROUP BY doc_id
"""


@gate("payload_near", _PAYLOAD_NEAR_SQL)
def payload_near(spark, sf_dir):
    """payload_near_scores(['key','agg'], slop=2, avg) over the
    pos%3+1-payloaded corpus: avg payload over all payloads of all
    ordered spans within slop, exactly reproduced arithmetically by the
    oracle's position self-join."""
    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.spans import payload_near_scores

    _, _, docs = get_engine(spark, sf_dir)
    payload_text = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda x, i: F.concat(
                x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
            ),
        ),
        " ",
    )
    fused = docs.select("doc_id", payload_text.alias("text"))
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    out = payload_near_scores(idx, ["key", "agg"], slop=2, function="avg")
    return _spark_score_q(out)


# ==========================================================================
# IndexWriter.AddIndexes: two half-corpus indexes concatenated with docBase
# rebasing must equal one full-corpus build — stats (df/ttf/dl/maxDoc) are
# re-aggregated, so BM25 scores match the single-build oracle exactly.
# ==========================================================================
from lucenenet_spark.plans.gate import _SQL_SCORED, _Q, _tsc


@gate(
    "add_indexes_term",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q
FROM ({_tsc('vector')})
""",
)
def add_indexes_term(spark, sf_dir):
    """Build two independent indexes over the doc_id halves (second half
    re-keyed to 0..m-1, the per-directory doc numbering AddIndexes sees),
    concatenate with add_indexes (docBase rebase restores the original
    ids), and score TermQuery('vector') — must equal the full-build
    oracle row for row."""
    import os as _os

    from lucenenet_spark.index.builder import add_indexes, build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    mid = docs.agg(F.expr("max(doc_id)")).collect()[0][0] // 2 + 1
    lo = docs.filter(F.col("doc_id") < mid)
    hi = docs.filter(F.col("doc_id") >= mid).withColumn(
        "doc_id", F.col("doc_id") - F.lit(mid)
    )
    idx = add_indexes(build_index(lo), build_index(hi))
    s = IndexSearcher(idx, mode="double")
    from lucenenet_spark.search.queries import TermQuery

    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# DocValues updates (Index/NumericDocValuesFieldUpdates.cs): an update
# batch overrides per-doc values without reindex; a sort over the merged
# view must reflect the updates. MERGE expressed as union + anti-join.
# ==========================================================================
@gate(
    "docvalues_update_sort",
    """
WITH dv AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN doc_id * 1000 ELSE n_chars END AS value
  FROM documents
)
SELECT doc_id, CAST(value AS BIGINT) AS value
FROM dv ORDER BY value DESC, doc_id ASC LIMIT 10
""",
)
def docvalues_update_sort(spark, sf_dir):
    """numeric doc-values from n_chars; an update batch rewrites every
    7th doc's value to doc_id*1000; top-10 by the merged value — the
    update must win over the base relation."""
    import os as _os

    from lucenenet_spark.index.docvalues import (
        apply_doc_values_updates,
        numeric_doc_values,
    )

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    dv = numeric_doc_values(docs, "doc_id", "n_chars")
    updates = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", (F.col("doc_id") * 1000).alias("value"))
    )
    merged = apply_doc_values_updates(dv, updates)
    return (
        merged.orderBy(F.desc("value"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.col("value").cast("long").alias("value"))
    )


# ==========================================================================
# Nordic + Russian Snowball packs (Analysis/{Sv,No,Da,Ru}/*Analyzer.cs):
# langs remapped es->sv, fr->no, de->da, zh->ru on the fly; the ru docs'
# token 'merge' is corrupted into the inflected Cyrillic form 'слияниями'
# so the Russian chain has a real suffix to strip. One routed engine
# serves both gates. Stemmer fidelity is pinned by the rule-traced
# fixtures in tests/test_snowball_nordic.py.
# ==========================================================================
_ROUTED_NORDIC_RU: dict[str, tuple] = {}

_RU_INFLECTED = "слияниями"  # instrumental plural; russian_stem -> 'слиян'


def get_engine_nordic_ru(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_nordic import (
        DanishAnalyzer,
        NorwegianAnalyzer,
        SwedishAnalyzer,
    )
    from lucenenet_spark.analysis.snowball_ru import RussianAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_NORDIC_RU:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select(
            "doc_id",
            F.when(
                F.col("lang") == "zh",
                F.regexp_replace("text", "merge", _RU_INFLECTED),
            ).otherwise(F.col("text")).alias("text"),
            F.when(F.col("lang") == "es", F.lit("sv"))
            .when(F.col("lang") == "fr", F.lit("no"))
            .when(F.col("lang") == "de", F.lit("da"))
            .when(F.col("lang") == "zh", F.lit("ru"))
            .otherwise(F.col("lang")).alias("lang"),
        )
        router = LanguageRoutedAnalyzer(
            {
                "sv": SwedishAnalyzer(),
                "no": NorwegianAnalyzer(),
                "da": DanishAnalyzer(),
                "ru": RussianAnalyzer(),
            }
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_NORDIC_RU[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_NORDIC_RU[key]


def _nordic_ru_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball_nordic import (
        danish_stem,
        norwegian_stem,
        swedish_stem,
    )
    from lucenenet_spark.analysis.snowball_ru import russian_stem
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn, extra=()):
        vocab = sorted(set(_CORPUS_VOCAB) | set(extra))
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in vocab if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    return (
        f"CASE WHEN lang2 = 'sv' THEN {case(swedish_stem)} "
        f"WHEN lang2 = 'no' THEN {case(norwegian_stem)} "
        f"WHEN lang2 = 'da' THEN {case(danish_stem)} "
        f"WHEN lang2 = 'ru' THEN {case(russian_stem, (_RU_INFLECTED,))} "
        f"ELSE term END"
    )


def _nordic_ru_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_nordic import (
        DANISH_STOP_WORDS,
        NORWEGIAN_STOP_WORDS,
        SWEDISH_STOP_WORDS,
    )
    from lucenenet_spark.analysis.snowball_ru import RUSSIAN_STOP_WORDS

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    return (
        f"((lang2 = 'sv' AND term NOT IN ({lst(SWEDISH_STOP_WORDS)})) OR "
        f"(lang2 = 'no' AND term NOT IN ({lst(NORWEGIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'da' AND term NOT IN ({lst(DANISH_STOP_WORDS)})) OR "
        f"(lang2 = 'ru' AND term NOT IN ({lst(RUSSIAN_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('sv', 'no', 'da', 'ru') AND "
        f"term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


_SNOWBALL_NORDIC_RU_SQL = """
WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN lang = 'zh' THEN replace(text, 'merge', '{inflected}')
              ELSE text END AS text,
         CASE lang WHEN 'es' THEN 'sv' WHEN 'fr' THEN 'no'
                   WHEN 'de' THEN 'da' WHEN 'zh' THEN 'ru'
                   ELSE lang END AS lang2
  FROM documents
),
tok AS (
  SELECT doc_id, lang2,
         unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id, {stem} AS term
  FROM tok
  WHERE term <> '' AND {stop}
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
WHERE p.term = '{qterm}'
"""


def _nordic_ru_sql(qterm: str) -> str:
    return _SNOWBALL_NORDIC_RU_SQL.format(
        inflected=_RU_INFLECTED,
        stem=_nordic_ru_stem_sql(),
        stop=_nordic_ru_stop_sql(),
        qterm=qterm,
    )


@gate("snowball_nordic_term_query", _nordic_ru_sql("merg"))
def snowball_nordic_term_query(spark, sf_dir):
    """TermQuery('merg') over the sv/no/da/ru routed index: all three
    Nordic stemmers reduce 'merge' -> 'merg' (e-ending in step 1's suffix
    set), en docs keep the unstemmed 'merge', and ru docs had theirs
    corrupted to Cyrillic — so the match set is exactly the Nordic docs,
    each scored with its own language's stop set in df/dl/avgdl."""
    _, s = get_engine_nordic_ru(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


@gate("russian_term_query", _nordic_ru_sql("слиян"))
def russian_term_query(spark, sf_dir):
    """TermQuery('слиян') — the Russian Snowball stem of the corrupted
    inflected form 'слияниями' (noun suffix ями + RV-confined и): only
    the remapped ru docs match, proving the Cyrillic tokenize -> stop ->
    stem chain end-to-end (Analysis/Ru/RussianAnalyzer.cs parity at gate
    granularity)."""
    _, s = get_engine_nordic_ru(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("слиян")))


# ==========================================================================
# Light-stemmer language packs (analysis/light.py): Arabic / Persian /
# Hindi (script-transliterated corrupt/restore) and Indonesian / Czech /
# Bulgarian. Langs are remapped on the fly (es/fr/de -> target), and for
# non-Latin scripts the text is deterministically transliterated char-
# by-char (translate() on BOTH sides) so each language's normalize+stem
# chain actually fires. Stemmer fidelity is pinned by the rule-traced
# fixtures in tests/test_light_stemmers.py; the gates prove the routed
# tokenize -> stop -> normalize -> stem -> BM25 pipeline end-to-end.
# ==========================================================================
from lucenenet_spark.analysis.light import (  # noqa: E402
    ARABIC_STOP_WORDS,
    BULGARIAN_STOP_WORDS,
    CZECH_STOP_WORDS,
    HINDI_STOP_WORDS,
    INDONESIAN_STOP_WORDS,
    PERSIAN_STOP_WORDS,
    arabic_normalize,
    arabic_stem,
    bulgarian_stem,
    czech_stem,
    hindi_normalize,
    hindi_stem,
    indonesian_stem,
    persian_normalize,
)

_TRANSLIT_SRC = "abcdefghijklmnopqrstuvwxyz"
_AR_DST = "ابثدةفجحيذكلمنوصقرستضعطخىز"
_HI_DST = "अबचदेफगहिजकलमनओपटरसतुवठडयझ"
_BG_DST = "абцдефгхийклмнопщрстувшжюз"


def _tr(word: str, dst: str) -> str:
    return word.translate(str.maketrans(_TRANSLIT_SRC, dst))


def _ar_final(w: str) -> str:
    return arabic_stem(arabic_normalize(w))


def _fa_final(w: str) -> str:
    return persian_normalize(w)


def _hi_final(w: str) -> str:
    return hindi_stem(hindi_normalize(w))


_ROUTED_LIGHT1: dict[str, tuple] = {}
_ROUTED_LIGHT2: dict[str, tuple] = {}


def get_engine_light_arfahi(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.light import (
        ArabicAnalyzer,
        HindiAnalyzer,
        PersianAnalyzer,
    )
    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_LIGHT1:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select(
            "doc_id",
            F.when(
                F.col("lang").isin("es", "fr"),
                F.translate("text", _TRANSLIT_SRC, _AR_DST),
            )
            .when(F.col("lang") == "de", F.translate("text", _TRANSLIT_SRC, _HI_DST))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("lang") == "es", F.lit("ar"))
            .when(F.col("lang") == "fr", F.lit("fa"))
            .when(F.col("lang") == "de", F.lit("hi"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
        router = LanguageRoutedAnalyzer(
            {"ar": ArabicAnalyzer(), "fa": PersianAnalyzer(), "hi": HindiAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_LIGHT1[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_LIGHT1[key]


def get_engine_light_idczbg(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.light import (
        BulgarianAnalyzer,
        CzechAnalyzer,
        IndonesianAnalyzer,
    )
    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_LIGHT2:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select(
            "doc_id",
            F.when(F.col("lang") == "de", F.translate("text", _TRANSLIT_SRC, _BG_DST))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("lang") == "es", F.lit("id"))
            .when(F.col("lang") == "fr", F.lit("cs"))
            .when(F.col("lang") == "de", F.lit("bg"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
        router = LanguageRoutedAnalyzer(
            {
                "id": IndonesianAnalyzer(),
                "cs": CzechAnalyzer(),
                "bg": BulgarianAnalyzer(),
            }
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_LIGHT2[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_LIGHT2[key]


def _case_over(vocab_pairs) -> str:
    whens = " ".join(
        f"WHEN '{src}' THEN '{dst}'" for src, dst in vocab_pairs if src != dst
    )
    return f"(CASE term {whens} ELSE term END)" if whens else "term"


def _stop_in(ws) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))


def _light1_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    ar_case = _case_over(
        (_tr(w, _AR_DST), _ar_final(_tr(w, _AR_DST))) for w in _CORPUS_VOCAB
    )
    fa_case = _case_over(
        (_tr(w, _AR_DST), _fa_final(_tr(w, _AR_DST))) for w in _CORPUS_VOCAB
    )
    hi_case = _case_over(
        (_tr(w, _HI_DST), _hi_final(_tr(w, _HI_DST))) for w in _CORPUS_VOCAB
    )
    stop = (
        f"((lang2 = 'ar' AND term NOT IN ({_stop_in(ARABIC_STOP_WORDS)})) OR "
        f"(lang2 = 'fa' AND term NOT IN ({_stop_in(PERSIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'hi' AND term NOT IN ({_stop_in(HINDI_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('ar', 'fa', 'hi') AND term NOT IN ({_stop_in(ENGLISH_STOP_WORDS)})))"
    )
    t_ar = _ar_final(_tr("merge", _AR_DST))
    t_fa = _fa_final(_tr("merge", _AR_DST))
    t_hi = _hi_final(_tr("merge", _HI_DST))
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE lang WHEN 'es' THEN 'ar' WHEN 'fr' THEN 'fa'
                   WHEN 'de' THEN 'hi' ELSE lang END AS lang2,
         CASE WHEN lang IN ('es', 'fr')
                THEN translate(text, '{_TRANSLIT_SRC}', '{_AR_DST}')
              WHEN lang = 'de'
                THEN translate(text, '{_TRANSLIT_SRC}', '{_HI_DST}')
              ELSE text END AS text
  FROM documents
),
tok AS (
  SELECT doc_id, lang2, unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id,
         CASE WHEN lang2 = 'ar' THEN {ar_case}
              WHEN lang2 = 'fa' THEN {fa_case}
              WHEN lang2 = 'hi' THEN {hi_case}
              ELSE term END AS term
  FROM tok
  WHERE term <> '' AND {stop}
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
       CAST(floor(SUM(ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term IN ('{t_ar}', '{t_fa}', '{t_hi}')
GROUP BY p.doc_id
"""


def _light2_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    id_case = _case_over((w, indonesian_stem(w)) for w in _CORPUS_VOCAB)
    cs_case = _case_over((w, czech_stem(w)) for w in _CORPUS_VOCAB)
    bg_case = _case_over(
        (_tr(w, _BG_DST), bulgarian_stem(_tr(w, _BG_DST))) for w in _CORPUS_VOCAB
    )
    stop = (
        f"((lang2 = 'id' AND term NOT IN ({_stop_in(INDONESIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'cs' AND term NOT IN ({_stop_in(CZECH_STOP_WORDS)})) OR "
        f"(lang2 = 'bg' AND term NOT IN ({_stop_in(BULGARIAN_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('id', 'cs', 'bg') AND term NOT IN ({_stop_in(ENGLISH_STOP_WORDS)})))"
    )
    t_id = indonesian_stem("merge")
    t_cs = czech_stem("merge")
    t_bg = bulgarian_stem(_tr("merge", _BG_DST))
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE lang WHEN 'es' THEN 'id' WHEN 'fr' THEN 'cs'
                   WHEN 'de' THEN 'bg' ELSE lang END AS lang2,
         CASE WHEN lang = 'de'
                THEN translate(text, '{_TRANSLIT_SRC}', '{_BG_DST}')
              ELSE text END AS text
  FROM documents
),
tok AS (
  SELECT doc_id, lang2, unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id,
         CASE WHEN lang2 = 'id' THEN {id_case}
              WHEN lang2 = 'cs' THEN {cs_case}
              WHEN lang2 = 'bg' THEN {bg_case}
              ELSE term END AS term
  FROM tok
  WHERE term <> '' AND {stop}
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
       CAST(floor(SUM(ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term IN ('{t_id}', '{t_cs}', '{t_bg}')
GROUP BY p.doc_id
"""


@gate("light_arfahi_term_query", _light1_sql())
def light_arfahi_term_query(spark, sf_dir):
    """OR of the three script-local stems of (transliterated) 'merge'
    over the ar/fa/hi routed index: Arabic Light-10 normalize+stem,
    Persian normalize (no stem, per the reference chain), Hindi
    normalize+light stem — Analysis/{Ar,Fa,Hi} parity at gate
    granularity (langs disjoint, so each doc scores via exactly its own
    language's chain)."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    _, s = get_engine_light_arfahi(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(_ar_final(_tr("merge", _AR_DST))), Occur.SHOULD),
        (TermQuery(_fa_final(_tr("merge", _AR_DST))), Occur.SHOULD),
        (TermQuery(_hi_final(_tr("merge", _HI_DST))), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


@gate("light_idczbg_term_query", _light2_sql())
def light_idczbg_term_query(spark, sf_dir):
    """OR of indonesian_stem('merge')='merge' (also matches unstemmed
    en/zh docs — both sides agree), czech_stem('merge')='merg', and the
    Bulgarian stem of Cyrillic-transliterated 'merge'='мерг' over the
    id/cs/bg routed index — Analysis/{Id,Cz,Bg} parity at gate
    granularity."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    _, s = get_engine_light_idczbg(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(indonesian_stem("merge")), Occur.SHOULD),
        (TermQuery(czech_stem("merge")), Occur.SHOULD),
        (TermQuery(bulgarian_stem(_tr("merge", _BG_DST))), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


# ==========================================================================
# Latvian + Sorani Kurdish packs: same remap/transliterate scheme
# (es -> lv keeps Latin text; fr -> ckb transliterates to Arabic script,
# where SoraniNormalizer then folds teh marbuta -> ae etc.). de/en/zh
# stay on the default English chain, so their unstemmed 'merge' matches
# neither query term.
# ==========================================================================
from lucenenet_spark.analysis.light import (  # noqa: E402
    LATVIAN_STOP_WORDS,
    SORANI_STOP_WORDS,
    latvian_stem,
    sorani_normalize,
    sorani_stem,
)

_ROUTED_LIGHT3: dict[str, tuple] = {}


def _ckb_final(w: str) -> str:
    return sorani_stem(sorani_normalize(w))


def get_engine_light_lvckb(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.light import LatvianAnalyzer, SoraniAnalyzer
    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_LIGHT3:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select(
            "doc_id",
            F.when(F.col("lang") == "fr", F.translate("text", _TRANSLIT_SRC, _AR_DST))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("lang") == "es", F.lit("lv"))
            .when(F.col("lang") == "fr", F.lit("ckb"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
        router = LanguageRoutedAnalyzer(
            {"lv": LatvianAnalyzer(), "ckb": SoraniAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_LIGHT3[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_LIGHT3[key]


def _light3_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    lv_case = _case_over((w, latvian_stem(w)) for w in _CORPUS_VOCAB)
    ckb_case = _case_over(
        (_tr(w, _AR_DST), _ckb_final(_tr(w, _AR_DST))) for w in _CORPUS_VOCAB
    )
    stop = (
        f"((lang2 = 'lv' AND term NOT IN ({_stop_in(LATVIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'ckb' AND term NOT IN ({_stop_in(SORANI_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('lv', 'ckb') AND term NOT IN ({_stop_in(ENGLISH_STOP_WORDS)})))"
    )
    t_lv = latvian_stem("merge")
    t_ckb = _ckb_final(_tr("merge", _AR_DST))
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE lang WHEN 'es' THEN 'lv' WHEN 'fr' THEN 'ckb'
                   ELSE lang END AS lang2,
         CASE WHEN lang = 'fr'
                THEN translate(text, '{_TRANSLIT_SRC}', '{_AR_DST}')
              ELSE text END AS text
  FROM documents
),
tok AS (
  SELECT doc_id, lang2, unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id,
         CASE WHEN lang2 = 'lv' THEN {lv_case}
              WHEN lang2 = 'ckb' THEN {ckb_case}
              ELSE term END AS term
  FROM tok
  WHERE term <> '' AND {stop}
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
       CAST(floor(SUM(ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term IN ('{t_lv}', '{t_ckb}')
GROUP BY p.doc_id
"""


@gate("light_lvckb_term_query", _light3_sql())
def light_lvckb_term_query(spark, sf_dir):
    """OR of latvian_stem('merge')='merg' and the Sorani stem of the
    Arabic-transliterated 'merge' over the lv/ckb routed index —
    Analysis/{Lv,Ckb} parity at gate granularity (unstemmed en/de/zh
    docs match neither term)."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    _, s = get_engine_light_lvckb(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(latvian_stem("merge")), Occur.SHOULD),
        (TermQuery(_ckb_final(_tr("merge", _AR_DST))), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


# ==========================================================================
# Phonetic module (Analysis.Phonetic/PhoneticFilter.cs + commons-codec
# Soundex): every term replaced by its phonetic key at index AND query
# time, so TermQuery(soundex('merge')) matches docs containing any word
# in merge's phonetic class — df/tf/norms all computed over key-merged
# postings on both sides.
# ==========================================================================
from lucenenet_spark.analysis.phonetic import soundex as _soundex  # noqa: E402

_PHONETIC_ENGINE: dict[str, tuple] = {}


def get_engine_phonetic(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.phonetic import PhoneticAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _PHONETIC_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(
            docs.select("doc_id", "text"), analyzer=PhoneticAnalyzer("soundex")
        ).cache()
        _PHONETIC_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _PHONETIC_ENGINE[key]


def _phonetic_sql() -> str:
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    sdx_case = _case_over((w, _soundex(w)) for w in _CORPUS_VOCAB)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tokf AS (
  SELECT doc_id, {sdx_case} AS term
  FROM tok WHERE term <> ''
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
WHERE p.term = '{_soundex("merge")}'
"""


@gate("phonetic_term_query", _phonetic_sql())
def phonetic_term_query(spark, sf_dir):
    """TermQuery(soundex('merge')) over a PhoneticAnalyzer(soundex)
    index (replace mode, no stop set — PhoneticFilter.cs semantics):
    phonetic-class retrieval with BM25 over key-merged postings."""
    _, s = get_engine_phonetic(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery(_soundex("merge"))))


# ==========================================================================
# Greek pack (Analysis/El): es -> el remap with Greek transliteration
# ('w' -> final sigma, 'x'/'y' -> accented vowels so the
# GreekLowerCaseFilter fold actually fires before the 23-rule stemmer).
# ==========================================================================
from lucenenet_spark.analysis.greek import (  # noqa: E402
    GREEK_STOP_WORDS,
    greek_lowercase,
    greek_stem,
)

_EL_DST = "αβψδεφγηιξκλμνοπθρστυωςάέζ"

_EL_ENGINE: dict[str, tuple] = {}


def _el_final(w: str) -> str:
    return greek_stem(greek_lowercase(w))


def get_engine_greek(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.greek import GreekAnalyzer
    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _EL_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        docs = docs.select(
            "doc_id",
            F.when(F.col("lang") == "es", F.translate("text", _TRANSLIT_SRC, _EL_DST))
            .otherwise(F.col("text"))
            .alias("text"),
            F.when(F.col("lang") == "es", F.lit("el"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
        router = LanguageRoutedAnalyzer({"el": GreekAnalyzer()})
        idx = build_index(docs, analyzer=router).cache()
        _EL_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _EL_ENGINE[key]


def _greek_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    el_case = _case_over(
        (_tr(w, _EL_DST), _el_final(_tr(w, _EL_DST))) for w in _CORPUS_VOCAB
    )
    stop = (
        f"((lang2 = 'el' AND term NOT IN ({_stop_in(GREEK_STOP_WORDS)})) OR "
        f"(lang2 <> 'el' AND term NOT IN ({_stop_in(ENGLISH_STOP_WORDS)})))"
    )
    t_el = _el_final(_tr("merge", _EL_DST))
    return f"""
WITH docs2 AS (
  SELECT doc_id,
         CASE lang WHEN 'es' THEN 'el' ELSE lang END AS lang2,
         CASE WHEN lang = 'es'
                THEN translate(text, '{_TRANSLIT_SRC}', '{_EL_DST}')
              ELSE text END AS text
  FROM documents
),
tok AS (
  SELECT doc_id, lang2, unnest(string_split(text, ' ')) AS term
  FROM docs2
),
tokf AS (
  SELECT doc_id,
         CASE WHEN lang2 = 'el' THEN {el_case} ELSE term END AS term
  FROM tok
  WHERE term <> '' AND {stop}
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
WHERE p.term = '{t_el}'
"""


@gate("greek_term_query", _greek_sql())
def greek_term_query(spark, sf_dir):
    """TermQuery over the Greek stem of transliterated 'merge' on an
    el-routed index: GreekLowerCaseFilter fold (final sigma, tonos) +
    the 23-rule GreekStemmer — Analysis/El parity, pinned separately by
    the 343 published golden vectors (tests/test_greek.py sample)."""
    _, s = get_engine_greek(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery(_el_final(_tr("merge", _EL_DST)))))
