"""Round-5 part-3 gates: second-wave Snowball packs (Romanian, Catalan).

Driver testdata carries only en/zh/es/de/fr langs, so the gate
deterministically REMAPS langs (es->ro, fr->ca) on the fly — both the
Spark plan and the DuckDB oracle apply the identical remap (same
corrupt/restore pattern as snowball_ptitnl_term_query). Stemmer fidelity
is pinned separately by the rule-traced fixture pairs in
tests/test_snowball_romance2.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import _spark_score_q, gate
from lucenenet_spark.search.queries import TermQuery

_ROUTED_ROCA: dict[str, tuple] = {}

_REMAP = {"es": "ro", "fr": "ca"}


def get_engine_routed_roca(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_romance2 import (
        CatalanAnalyzer,
        RomanianAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_ROCA:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        remap = F.create_map(*[F.lit(x) for kv in _REMAP.items() for x in kv])
        docs = docs.withColumn(
            "lang", F.coalesce(remap[F.col("lang")], F.col("lang"))
        )
        router = LanguageRoutedAnalyzer(
            {"ro": RomanianAnalyzer(), "ca": CatalanAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_ROCA[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_ROCA[key]


def _roca_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball_romance2 import (
        catalan_stem,
        romanian_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    return (
        f"CASE WHEN lang2 = 'ro' THEN {case(romanian_stem)} "
        f"WHEN lang2 = 'ca' THEN {case(catalan_stem)} "
        f"ELSE term END"
    )


def _roca_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_romance2 import (
        CATALAN_STOP_WORDS,
        ROMANIAN_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    return (
        f"((lang2 = 'ro' AND term NOT IN ({lst(ROMANIAN_STOP_WORDS)})) OR "
        f"(lang2 = 'ca' AND term NOT IN ({lst(CATALAN_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('ro', 'ca') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


_SNOWBALL_ROCA_SQL = """
WITH docs2 AS (
  SELECT doc_id, text,
         CASE lang WHEN 'es' THEN 'ro' WHEN 'fr' THEN 'ca'
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
WHERE p.term = 'merg'
"""


def _roca_sql() -> str:
    return _SNOWBALL_ROCA_SQL.format(stem=_roca_stem_sql(), stop=_roca_stop_sql())


@gate("snowball_roca_term_query", _roca_sql())
def snowball_roca_term_query(spark, sf_dir):
    """TermQuery('merg') over a ro/ca routed index (langs remapped
    es->ro, fr->ca): both languages stem 'merge' -> 'merg' by their own
    Snowball rules, each filtered by its own stop set —
    Analysis/{Ro,Ca} analyzer parity at gate granularity."""
    _, s = get_engine_routed_roca(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))


# ===========================================================================
# Finnish + Hungarian (Uralic) — same remap-on-the-fly pattern
# ===========================================================================

_ROUTED_FIHU: dict[str, tuple] = {}

_REMAP_FIHU = {"es": "fi", "fr": "hu"}


def get_engine_routed_fihu(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.snowball import LanguageRoutedAnalyzer
    from lucenenet_spark.analysis.snowball_uralic import (
        FinnishAnalyzer,
        HungarianAnalyzer,
    )
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ROUTED_FIHU:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        remap = F.create_map(
            *[F.lit(x) for kv in _REMAP_FIHU.items() for x in kv]
        )
        docs = docs.withColumn(
            "lang", F.coalesce(remap[F.col("lang")], F.col("lang"))
        )
        router = LanguageRoutedAnalyzer(
            {"fi": FinnishAnalyzer(), "hu": HungarianAnalyzer()}
        )
        idx = build_index(docs, analyzer=router).cache()
        _ROUTED_FIHU[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ROUTED_FIHU[key]


def _fihu_stem_sql() -> str:
    from lucenenet_spark.analysis.snowball_uralic import (
        finnish_stem,
        hungarian_stem,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def case(stem_fn):
        whens = " ".join(
            f"WHEN '{t}' THEN '{stem_fn(t)}'"
            for t in _CORPUS_VOCAB if stem_fn(t) != t
        )
        return f"(CASE term {whens} ELSE term END)" if whens else "term"

    return (
        f"CASE WHEN lang2 = 'fi' THEN {case(finnish_stem)} "
        f"WHEN lang2 = 'hu' THEN {case(hungarian_stem)} "
        f"ELSE term END"
    )


def _fihu_stop_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.snowball_uralic import (
        FINNISH_STOP_WORDS,
        HUNGARIAN_STOP_WORDS,
    )

    def lst(ws):
        return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(ws))

    return (
        f"((lang2 = 'fi' AND term NOT IN ({lst(FINNISH_STOP_WORDS)})) OR "
        f"(lang2 = 'hu' AND term NOT IN ({lst(HUNGARIAN_STOP_WORDS)})) OR "
        f"(lang2 NOT IN ('fi', 'hu') AND term NOT IN ({lst(ENGLISH_STOP_WORDS)})))"
    )


def _fihu_sql() -> str:
    sql = _SNOWBALL_ROCA_SQL.replace(
        "WHEN 'es' THEN 'ro' WHEN 'fr' THEN 'ca'",
        "WHEN 'es' THEN 'fi' WHEN 'fr' THEN 'hu'",
    )
    return sql.format(stem=_fihu_stem_sql(), stop=_fihu_stop_sql())


@gate("snowball_fihu_term_query", _fihu_sql())
def snowball_fihu_term_query(spark, sf_dir):
    """TermQuery('merg') over a fi/hu routed index (langs remapped
    es->fi, fr->hu): both languages stem 'merge' -> 'merg' by their own
    Snowball rules, each filtered by its own stop set — Analysis/{Fi,Hu}
    analyzer parity at gate granularity."""
    _, s = get_engine_routed_fihu(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merg")))
