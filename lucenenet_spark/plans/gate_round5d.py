"""Round-5d driver gates: Lucene.Net.Expressions surface.

Each gate compiles an expression-language source string to a Spark
Column (search/expressions.py) and checks it against a DuckDB oracle
evaluating the same arithmetic in SQL. Quantization follows the repo
convention (floor(x*1e4+0.5) bigint) for transcendental results; the
bitwise/ternary gate stays in exact integer space so its values hash
exactly with no quantization.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import GATE_QUERIES, gate, get_engine
from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _Q, _tsc


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


# ==========================================================================
# ExpressionSortField: sort orders by a compiled javascript expression
# (Expressions/ExpressionSortField.cs + JS/JavascriptCompiler.cs)
# ==========================================================================
@gate(
    "expression_sort",
    """
SELECT o_orderkey,
       CAST(floor((ln(o_totalprice + 1) + 0.1 * sqrt(CAST(o_custkey AS DOUBLE)))
                  * 10000 + 0.5) AS BIGINT) AS expr_q
FROM orders
ORDER BY expr_q DESC, o_orderkey ASC
LIMIT 20
""",
)
def expression_sort_gate(spark, sf_dir):
    """Top-20 orders by `ln(o_totalprice + 1) + 0.1 * sqrt(o_custkey)`
    compiled via the expression language (JavascriptCompiler.Compile +
    ExpressionSortField) — the whole expression lowers to Catalyst ops,
    executed as TakeOrderedAndProject (no global sort)."""
    from lucenenet_spark.search.expressions import SimpleBindings, expression_sort

    df = _orders(spark, sf_dir)
    b = SimpleBindings().add_field("o_totalprice").add_field("o_custkey")
    out = expression_sort(
        df, "ln(o_totalprice + 1) + 0.1 * sqrt(o_custkey)", b,
        k=20, tie_col="o_orderkey", out_col="expr_value",
    )
    return out.select(
        "o_orderkey",
        F.floor(F.col("expr_value") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("expr_q"),
    )


# ==========================================================================
# Bitwise / comparison / ternary semantics: exact-integer domain so the
# driver hash is quantization-free (JavascriptCompiler bytecode D2L ops)
# ==========================================================================
@gate(
    "expression_bitwise",
    """
SELECT o_orderkey,
       CAST(CASE WHEN (o_custkey & 255) % 2 = 0
                 THEN ((o_custkey & 63) << 2) | (o_orderkey % 7)
                 ELSE xor(o_custkey & 1023, 21) + (o_orderkey % 5)
            END AS BIGINT) AS expr_v
FROM orders
ORDER BY o_orderkey ASC
LIMIT 200
""",
)
def expression_bitwise_gate(spark, sf_dir):
    """Ternary + comparison + bitwise and/or/xor/shift over integer-valued
    doubles: `(o_custkey & 255) % 2 == 0 ? ((o_custkey & 63) << 2) |
    (o_orderkey % 7) : (o_custkey & 1023 ^ 21) + (o_orderkey % 5)`.
    All intermediates stay integers < 2^53 so the double arithmetic is
    exact and the bigint cast loses nothing (DuckDB spells xor as a
    function, '^' being exponentiation there)."""
    from lucenenet_spark.search.expressions import compile_expression

    df = _orders(spark, sf_dir)
    expr = compile_expression(
        "(o_custkey & 255) % 2 == 0"
        " ? ((o_custkey & 63) << 2) | (o_orderkey % 7)"
        " : ((o_custkey & 1023) ^ 21) + (o_orderkey % 5)"
    )
    col = expr.column({"o_custkey": df["o_custkey"], "o_orderkey": df["o_orderkey"]})
    return (
        df.select("o_orderkey", col.cast("long").alias("expr_v"))
        .orderBy(F.col("o_orderkey").asc())
        .limit(200)
    )


# ==========================================================================
# ExpressionRescorer: BM25 first pass, expression second pass blending
# _score with a stored numeric doc value (Expressions/ExpressionRescorer.cs)
# ==========================================================================
@gate(
    "expression_rescore",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
, first_pass AS (
  SELECT doc_id, score FROM ({_tsc('merge')})
  ORDER BY {_Q} DESC, doc_id ASC LIMIT 50
)
SELECT f.doc_id,
       CAST(floor((0.7 * f.score + 0.3 * log10(1 + d.n_chars)) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM first_pass f JOIN documents d USING (doc_id)
ORDER BY score_q DESC, f.doc_id ASC LIMIT 10
""",
)
def expression_rescore_gate(spark, sf_dir):
    """Top-50 BM25 hits for 'merge' re-ranked by the compiled expression
    `0.7 * _score + 0.3 * log10(1 + n_chars)` joined against the stored
    n_chars doc value — the ExpressionRescorer pattern: rescoring cost is
    O(first-pass hits), not O(corpus)."""
    from lucenenet_spark.search.expressions import SimpleBindings, expression_rescore
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    hits = (
        s.scored(TermQuery("merge"))
        .orderBy(
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").desc(),
            F.col("doc_id").asc(),
        )
        .limit(50)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    out = expression_rescore(
        hits,
        "0.7 * _score + 0.3 * log10(1 + n_chars)",
        SimpleBindings().add_field("n_chars"),
        k=10,
    )
    return out.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )


# ==========================================================================
# Sandbox queries (Lucene.Net.Sandbox/Queries) + Queries/TermsFilter
# ==========================================================================

# similarity/boost exprs shared by the two fuzzy oracles (prefixLength=0,
# target 'tabl', minSim 0.5): sim = 1 - lev/min(len), boost = (sim-.5)/.5
_SF_SIM = "(1.0 - levenshtein(term, '{t}') / CAST(least(length(term), {n}) AS DOUBLE))"


def _slow_fuzzy_sql() -> str:
    sim = _SF_SIM.format(t="tabl", n=4)
    return SQL_PRELUDE + "," + _SQL_SCORED + f"""
, var AS (
  SELECT term, ({sim} - 0.5) / 0.5 AS vboost
  FROM ts
  WHERE {sim} > 0.5
  ORDER BY CAST(floor((({sim} - 0.5) / 0.5) * 1000000 + 0.5) AS BIGINT) DESC, term ASC
  LIMIT 50
)
SELECT s.doc_id,
       CAST(floor(sum(v.vboost * s.idf * 2.2 * s.tf / (s.tf + s.nrm)) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM sc s JOIN var v USING (term)
GROUP BY s.doc_id
ORDER BY score_q DESC, s.doc_id ASC LIMIT 10
"""


@gate("slow_fuzzy_query", _slow_fuzzy_sql())
def slow_fuzzy_query(spark, sf_dir):
    """SlowFuzzyQuery('tabl', minSim=0.5): similarity-threshold variants
    with boost (sim-minSim)/(1-minSim) OR-ed into BM25
    (Sandbox/Queries/SlowFuzzyQuery.cs + SlowFuzzyTermsEnum.cs:119,148)."""
    from lucenenet_spark.plans.gate import _spark_score_q as score_q
    from lucenenet_spark.search.sandbox import SlowFuzzyQuery, slow_fuzzy_rewrite

    _, s, _ = get_engine(spark, sf_dir)
    q = slow_fuzzy_rewrite(s, SlowFuzzyQuery(term="tabl", min_similarity=0.5))
    out = s.scored(q)
    return (
        score_q(out)
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def _flt_sql() -> str:
    sims = {src: _SF_SIM.format(t=src, n=len(src)) for src in ("tabl", "merg")}
    cand_selects = " UNION ALL ".join(
        f"""
  SELECT '{src}' AS src, term AS vterm, df, ({sim} - 0.5) / 0.5 AS boost
  FROM ts WHERE {sim} > 0.5"""
        for src, sim in sims.items()
    )
    return SQL_PRELUDE + f"""
, cand AS ({cand_selects})
, kept AS (
  SELECT * FROM (
    SELECT cand.*,
           row_number() OVER (
             PARTITION BY src
             ORDER BY CAST(floor(boost * 1000000 + 0.5) AS BIGINT) DESC, vterm ASC
           ) AS rn
    FROM cand
  ) WHERE rn <= 50
)
, dfres AS (
  SELECT k.src,
         coalesce((SELECT ts.df FROM ts WHERE ts.term = k.src), sum(k.df) // count(*)) AS sdf
  FROM kept k GROUP BY k.src
)
, final AS (
  SELECT k.vterm,
         k.boost * k.boost * (ln(cs.n / (d.sdf + 1)) + 1) AS fscore
  FROM kept k JOIN dfres d USING (src), cs
)
, topq AS (
  SELECT vterm, fscore FROM final
  ORDER BY CAST(floor(fscore * 1000000 + 0.5) AS BIGINT) DESC, vterm ASC
  LIMIT 10
)
SELECT p.doc_id,
       CAST(floor(sum(t.fscore) * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN topq t ON p.term = t.vterm
GROUP BY p.doc_id
ORDER BY score_q DESC, p.doc_id ASC LIMIT 20
"""


@gate("fuzzy_like_this", _flt_sql())
def fuzzy_like_this_gate(spark, sf_dir):
    """FuzzyLikeThisQuery('tabl merg'): per-source-term fuzzy variants,
    source-idf folded scores (score = boost^2 * (ln(N/(df+1))+1), avg
    variant df when the source term is absent), global top-10 variants,
    ignoreTF ConstantScore sum per doc
    (Sandbox/Queries/FuzzyLikeThisQuery.cs:229,318,337)."""
    from lucenenet_spark.search.sandbox import fuzzy_like_this

    _, s, _ = get_engine(spark, sf_dir)
    out = fuzzy_like_this(
        s, "tabl merg", min_similarity=0.5, max_num_terms=10, ignore_tf=True
    )
    return (
        out.select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
        )
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@gate(
    "sorted_set_sort",
    SQL_PRELUDE + """
SELECT doc_id, min(term) AS sort_key
FROM post GROUP BY doc_id
ORDER BY sort_key ASC, doc_id ASC LIMIT 20
""",
)
def sorted_set_sort(spark, sf_dir):
    """SortedSetSortField(MIN, asc): docs ordered by the smallest value of
    a multivalued string field (Sandbox/Queries/SortedSetSortField.cs +
    SortedSetSelector MIN) — one partial-agg groupBy into TakeOrdered."""
    from lucenenet_spark.search.sandbox import sorted_set_sort_field

    idx, _, _ = get_engine(spark, sf_dir)
    dv = idx.postings.filter(F.col("field") == "text").select("doc_id", "term")
    return sorted_set_sort_field(dv, value_col="term", selector="min", ascending=True, k=20)


@gate(
    "terms_filter",
    SQL_PRELUDE + """
SELECT DISTINCT doc_id FROM post WHERE term IN ('merge', 'scan', 'dup')
""",
)
def terms_filter_gate(spark, sf_dir):
    """TermsFilter (Queries/TermsFilter.cs): match-any-of-N set filter as a
    single IN-list predicate over postings — one scan, pushdown-friendly."""
    from lucenenet_spark.search.sandbox import terms_filter

    idx, _, _ = get_engine(spark, sf_dir)
    return terms_filter(idx, ["merge", "scan", "dup"])


# ==========================================================================
# ICU folding (Lucene.Net.Analysis.Icu/ICUFoldingFilter.cs)
# ==========================================================================
_ICU_ENGINE: dict[str, tuple] = {}


def _icu_engine(spark, sf_dir):
    """Index the corpus with every vowel swapped for an accented variant
    (deterministic translate in BOTH engines' reach), analyzed through
    ICUFoldingAnalyzer — folding must restore the plain-ASCII index
    exactly, so the oracle is the PLAIN corpus's scoring CTE."""
    import os as _os

    from lucenenet_spark.analysis.icu import ICUFoldingAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _ICU_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        accented = docs.withColumn("text", F.translate("text", "aeiou", "àéîõü"))
        idx = build_index(accented, analyzer=ICUFoldingAnalyzer()).cache()
        _ICU_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _ICU_ENGINE[key]


@gate(
    "icu_folding_term",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('merge')})
""",
)
def icu_folding_term(spark, sf_dir):
    """BM25 for 'merge' over an accent-decorated corpus indexed through
    ICUFoldingAnalyzer (NFKC + casefold + diacritic strip): folding makes
    the decorated index identical — tf, df, doclens, norms — to the plain
    corpus the oracle scores (ICUFoldingFilter.cs / UTR#30)."""
    from lucenenet_spark.plans.gate import _spark_score_q as score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _icu_engine(spark, sf_dir)
    return score_q(s.scored(TermQuery("merge")))


# ==========================================================================
# Training-pipeline operators: deterministic stratified sampling +
# benchmark decontamination (n-gram overlap)
# ==========================================================================

def _hex8_of(key_sql: str) -> str:
    """First 8 hex chars of md5(key) as an integer, digit by digit —
    the DuckDB mirror of sampling.sample_hash (same trick as the
    MinHash oracle in gate_pipeline)."""
    dig = "(strpos('0123456789abcdef', substr(md5({k}), {p}, 1)) - 1)"
    return " + ".join(
        f"({dig.format(k=key_sql, p=j + 1)}) * {16 ** (7 - j)}" for j in range(8)
    )


def _stratified_sql() -> str:
    h = _hex8_of("concat('mix1#', CAST(doc_id AS VARCHAR))")
    return f"""
SELECT doc_id, lang FROM documents
WHERE ({h}) % 1000000 <
      CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000
                WHEN 'zh' THEN 100000 ELSE 50000 END
"""


@gate("stratified_sample", _stratified_sql())
def stratified_sample_gate(spark, sf_dir):
    """Mixture-weighted corpus sampling: keep 50% en / 20% de / 10% zh /
    5% tail, decided by a salted md5 hash of the doc id — deterministic
    across reruns and cluster sizes, zero shuffles (one CASE threshold
    inside the scan filter). functions/sampling.py."""
    from lucenenet_spark.functions.sampling import stratified_sample
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    out = stratified_sample(
        docs, "lang", {"en": 0.5, "de": 0.2, "zh": 0.1},
        default_fraction=0.05, salt="mix1",
    )
    return out.select("doc_id", "lang")


_DECONTAM_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
dg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 12), ' ') AS shingle
  FROM toks, UNNEST(range(1, greatest(len(t) - 11, 1))) AS u(i)
),
pg AS (
  SELECT DISTINCT doc_id AS probe_id,
         array_to_string(list_slice(t, i, i + 12), ' ') AS shingle
  FROM (SELECT doc_id, list_slice(t, 1, 40) AS t FROM toks WHERE doc_id % 50 = 0),
       UNNEST(range(1, greatest(len(t) - 11, 1))) AS u(i)
),
perdoc AS (SELECT doc_id, count(*) AS doc_grams FROM dg GROUP BY doc_id),
hits AS (
  SELECT d.doc_id, p.probe_id, count(*) AS overlap
  FROM dg d JOIN pg p USING (shingle) GROUP BY d.doc_id, p.probe_id
)
SELECT h.doc_id, h.probe_id, CAST(h.overlap AS BIGINT) AS overlap,
       CAST(x.doc_grams AS BIGINT) AS doc_grams
FROM hits h JOIN perdoc x USING (doc_id)
"""


@gate("decontam_overlap", _DECONTAM_SQL)
def decontam_overlap(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix-C recipe): 13-token-gram
    overlap between every training doc and a probe set (each 50th doc's
    40-token prefix, standing in for benchmark examples). Reports
    (doc, probe, shared distinct 13-grams, doc grams); near-duplicate
    docs of a probed source surface alongside the source itself.
    functions/decontam.py — probe side broadcast, train side never
    shuffled on raw strings."""
    from lucenenet_spark.functions.decontam import ngram_overlap_report
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    probes = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("probe_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 40)).alias("text"),
    )
    return ngram_overlap_report(docs, probes, n=13)


# ==========================================================================
# Embedding-cosine near-duplicate detection (banded hyperplane LSH +
# exact quantized cosine verify) — functions/dedup.embedding_near_duplicates
# ==========================================================================
_END_PLANES = 16
_END_BANDS = 4
_END_SEED = 42
_END_DIM = 64
_END_THRESH = 0.40


def _embed_neardup_sql() -> str:
    from lucenenet_spark.functions.similarity import hyperplanes

    planes = hyperplanes(_END_PLANES, _END_SEED, _END_DIM)
    sign_cases = ",\n           ".join(
        "CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(repr(x) for x in plane)
        + "]) >= 0 THEN '1' ELSE '0' END"
        for plane in planes
    )
    width = _END_PLANES // _END_BANDS
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, concat('{b}|', substr(sig, {b * width + 1}, {width})) AS bkey FROM sig"
        for b in range(_END_BANDS)
    )
    thresh_q = int(round(_END_THRESH * 10000))
    return f"""
WITH sig AS (
  SELECT vec_id,
         concat(
           {sign_cases}
         ) AS sig
  FROM embeddings
),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b USING (bkey)
  WHERE a.vec_id < b.vec_id
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT c.id_a, c.id_b,
         CAST(floor(list_dot_product(x.v, y.v)
               / sqrt(list_dot_product(x.v, x.v) * list_dot_product(y.v, y.v))
               * 10000 + 0.5) AS BIGINT) AS cos_q
  FROM cand c
  JOIN e x ON x.vec_id = c.id_a
  JOIN e y ON y.vec_id = c.id_b
)
SELECT id_a, id_b, cos_q FROM scored WHERE cos_q >= {thresh_q}
"""


@gate("dedup_embedding_cosine", _embed_neardup_sql())
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs: 16-plane/4-band sign-LSH candidate
    generation, exact zip_with-fold cosine verify at threshold 0.40 (the
    synthetic corpus's top pairwise cosine is ~0.51, so the gate exercises
    both collision and verification). Oracle reproduces the identical
    plane literals, band keys, and quantized cosine."""
    import os

    from lucenenet_spark.functions.dedup import embedding_near_duplicates

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_duplicates(
        emb, _END_THRESH, n_planes=_END_PLANES, n_bands=_END_BANDS,
        seed=_END_SEED, dim=_END_DIM,
    )


# ==========================================================================
# Hunspell affix stemming wired into indexing + search
# (Analysis/Hunspell/HunspellStemFilter.cs longestOnly mode over an inline
# .aff/.dic pair, the reference's own test-dictionary pattern).
# ==========================================================================
_HUN_AFF = """SET UTF-8

SFX A Y 1
SFX A   0     e         .

PFX B Y 1
PFX B   0     s         .
"""

# surface forms: valu+e=value, tabl+e=table, merg+e=merge, lin+e=line,
# s+can=scan; every other corpus token has no stem and passes through.
_HUN_DIC = """5
valu/A
tabl/A
merg/A
lin/A
can/B
"""

_HUN_ENGINE: dict[str, tuple] = {}


def _hunspell_engine(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS
    from lucenenet_spark.analysis.hunspell import hunspell_analyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _HUN_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        an = hunspell_analyzer(_HUN_AFF, _HUN_DIC, stopwords=ENGLISH_STOP_WORDS)
        idx = build_index(docs, analyzer=an).cache()
        _HUN_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _HUN_ENGINE[key]


def _hunspell_sql_tail(term: str) -> str:
    """Stem CASE generated by the SAME longest-only stemmer the engine
    routes through (fidelity of the affix engine itself is pinned by the
    reference-traced tables in tests/test_hunspell.py)."""
    from lucenenet_spark.analysis.hunspell import (
        HunspellDictionary,
        HunspellStemmer,
        _make_longest_only,
    )
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    stem = _make_longest_only(HunspellStemmer(HunspellDictionary(_HUN_AFF, _HUN_DIC)))
    whens = " ".join(
        f"WHEN '{t}' THEN '{stem(t)}'" for t in _CORPUS_VOCAB if stem(t) != t
    )
    return f""",
tokst AS (SELECT doc_id, CASE term {whens} ELSE term END AS term, pos FROM tokf),
post2 AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tokst GROUP BY doc_id, term),
ts2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post2 GROUP BY term)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts2.df + 0.5) / (ts2.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post2 p JOIN dl USING (doc_id) JOIN ts2 USING (term), cs
WHERE p.term = '{term}'
"""


@gate("hunspell_term_query", SQL_PRELUDE + _hunspell_sql_tail("tabl"))
def hunspell_term_query(spark, sf_dir):
    """TermQuery('tabl') over a Hunspell-stemmed index: the SFX rule
    restores 'table' -> dict entry 'tabl', so df/tf/scores are computed on
    the affix-stemmed vocabulary (suffix strip, longest-only selection);
    dl/avgdl unchanged (stemming is term-renaming)."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _hunspell_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("tabl")))


@gate("hunspell_prefix_strip", SQL_PRELUDE + _hunspell_sql_tail("can"))
def hunspell_prefix_strip(spark, sf_dir):
    """TermQuery('can'): PFX rule strips the leading 's' of 'scan' and
    validates the restored stem against the dict entry 'can/B' — prefix
    rules participate in indexing exactly like suffixes."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _hunspell_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("can")))


# ==========================================================================
# PathHierarchyTokenizer drill-down (Analysis/Path/PathHierarchyTokenizer.cs)
# ==========================================================================
_PATH_ENGINE: dict[str, tuple] = {}


def _path_engine(spark, sf_dir):
    import os as _os

    from lucenenet_spark.analysis.path_hierarchy import PathHierarchyAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _PATH_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        paths = docs.select(
            "doc_id",
            F.concat(
                F.lit("/"), F.col("lang"), F.lit("/"), F.col("source"),
                F.lit("/"), F.col("doc_id").cast("string"),
            ).alias("text"),
        )
        idx = build_index(paths, analyzer=PathHierarchyAnalyzer()).cache()
        _PATH_ENGINE[key] = (idx, IndexSearcher(idx))
    return _PATH_ENGINE[key]


@gate(
    "path_drilldown",
    "SELECT doc_id FROM documents WHERE lang = 'en' AND source = 'src3'",
)
def path_drilldown(spark, sf_dir):
    """Drill-down on a hierarchical path facet: each doc indexes the
    growing prefixes of /lang/source/doc_id, so a TermQuery on the
    ancestor path '/en/src3' selects exactly that subtree — the
    taxonomy-facet pattern with component-boundary semantics (no
    LIKE-prefix false positives such as src30)."""
    from lucenenet_spark.search.queries import TermQuery

    _, s = _path_engine(spark, sf_dir)
    return s.docset(TermQuery("/en/src3"))


# ==========================================================================
# ClassicAnalyzer (Analysis/Standard/ClassicAnalyzer.cs + ClassicFilter.cs)
# and WordDelimiterFilter (Analysis/Miscellaneous/WordDelimiterFilter.cs)
# ==========================================================================
from lucenenet_spark.plans.gate import _spark_score_q  # noqa: E402


def _reroot_prelude(docs2_cte: str) -> str:
    """Re-root the shared BM25 prelude on an augmented docs2 corpus
    (same trick as gate_round3._PRELUDE_URL)."""
    return (
        SQL_PRELUDE.replace("WITH tok AS", "WITH " + docs2_cte + ",\ntok AS")
        .replace("FROM documents\n", "FROM docs2\n")
        .replace("FROM documents d", "FROM docs2 d")
    )


_CLASSIC_DOCS2 = (
    "docs2 AS (SELECT doc_id, text || ' usa dept' "
    "|| CAST(doc_id % 7 AS VARCHAR) || ' corp' AS text FROM documents)"
)
_CLASSIC_ENGINE: dict[str, tuple] = {}


def _classic_engine(spark, sf_dir):
    from lucenenet_spark.analysis.classic import ClassicAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _CLASSIC_ENGINE:
        _, _, docs = get_engine(spark, sf_dir)
        docs2 = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" u.s.a. dept"), (F.col("doc_id") % 7).cast("string"),
                F.lit(" corp's"),
            ).alias("text"),
        )
        idx = build_index(docs2, analyzer=ClassicAnalyzer()).cache()
        _CLASSIC_ENGINE[key] = IndexSearcher(idx, mode="double")
    return _CLASSIC_ENGINE[key]


@gate(
    "classic_analysis",
    _reroot_prelude(_CLASSIC_DOCS2) + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("dept3") + """)
""",
)
def classic_analysis(spark, sf_dir):
    """ClassicAnalyzer round-trip: the injected raw suffix
    `` u.s.a. dept3 corp's`` must analyze to exactly ``usa dept3 corp``
    (ACRONYM dot-strip, possessive strip BEFORE the stop filter) so BM25
    for ``dept3`` matches the plain-word oracle corpus bit-for-bit —
    scores, df, and dl all shift identically on both sides."""
    from lucenenet_spark.search.queries import TermQuery

    s = _classic_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("dept3")))


_WDF_DOCS2 = (
    "docs2 AS (SELECT doc_id, text || ' wi fi ' "
    "|| CAST(doc_id % 7 AS VARCHAR) || ' pro' AS text FROM documents)"
)
_WDF_ENGINE: dict[str, tuple] = {}


def _wdf_engine(spark, sf_dir):
    from lucenenet_spark.analysis.worddelim import WordDelimiterAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _WDF_ENGINE:
        _, _, docs = get_engine(spark, sf_dir)
        docs2 = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" WiFi"), (F.col("doc_id") % 7).cast("string"),
                F.lit("Pro's"),
            ).alias("text"),
        )
        idx = build_index(docs2, analyzer=WordDelimiterAnalyzer()).cache()
        _WDF_ENGINE[key] = IndexSearcher(idx, mode="double")
    return _WDF_ENGINE[key]


@gate(
    "word_delimiter_phrase",
    _reroot_prelude(_WDF_DOCS2) + "," + _SQL_SCORED + """,
pf AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS freq
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fi' AND b.term = '3'
  GROUP BY a.doc_id
),
idfs AS (
  SELECT ((SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = 'fi')
        + (SELECT ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) FROM ts, cs WHERE term = '3')) AS idf
)
SELECT pf.doc_id,
       CAST(floor((idfs.idf * 2.2 * pf.freq /
             (pf.freq + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
       AS score_q
FROM pf JOIN dl USING (doc_id), idfs, cs
""",
)
def word_delimiter_phrase(spark, sf_dir):
    """WordDelimiterFilter positions end-to-end: the raw token
    ``WiFi3Pro's`` expands to ``wi fi 3 pro`` at CONSECUTIVE positions
    (case-change + numeric splits + possessive strip), so the exact
    PhraseQuery ``"fi 3"`` selects doc_id%7==3 with scores matching the
    pre-split oracle corpus."""
    from lucenenet_spark.search.queries import PhraseQuery

    s = _wdf_engine(spark, sf_dir)
    return _spark_score_q(s.scored(PhraseQuery(terms=("fi", "3"))))


# ==========================================================================
# SetKeywordMarkerFilter + StemmerOverrideFilter
# (Analysis/Miscellaneous/SetKeywordMarkerFilter.cs, StemmerOverrideFilter.cs)
# ==========================================================================
_KWM_ENGINE: dict[str, tuple] = {}


def _kwm_engine(spark, sf_dir):
    from lucenenet_spark.analysis.analyzers import EnglishAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _KWM_ENGINE:
        _, _, docs = get_engine(spark, sf_dir)
        idx = build_index(
            docs,
            analyzer=EnglishAnalyzer(
                stem_exclusions=frozenset({"merge"}),
                stem_overrides={"stream": "flow"},
            ),
        ).cache()
        _KWM_ENGINE[key] = IndexSearcher(idx, mode="double")
    return _KWM_ENGINE[key]


def _kwm_stem_case() -> str:
    from lucenenet_spark.analysis.porter import porter_stem
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB

    def m(t: str) -> str:
        if t == "stream":
            return "flow"  # StemmerOverrideFilter entry
        if t == "merge":
            return t  # SetKeywordMarkerFilter exclusion
        return porter_stem(t)

    whens = " ".join(f"WHEN '{t}' THEN '{m(t)}'" for t in _CORPUS_VOCAB if m(t) != t)
    return f"CASE term {whens} ELSE term END"


@gate(
    "keyword_marker_stem",
    SQL_PRELUDE + f""",
tokst AS (SELECT doc_id, {_kwm_stem_case()} AS term, pos FROM tokf),
post2 AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tokst GROUP BY doc_id, term),
ts2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post2 GROUP BY term),
sc2 AS (
  SELECT p.doc_id, p.term,
         ln(1 + (cs.n - ts2.df + 0.5) / (ts2.df + 0.5)) * 2.2 * p.tf
           / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n))) AS score
  FROM post2 p JOIN dl USING (doc_id) JOIN ts2 USING (term), cs
)
SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
FROM sc2 WHERE term IN ('merge', 'flow') GROUP BY doc_id
""",
)
def keyword_marker_stem(spark, sf_dir):
    """Stem protection end-to-end: 'merge' is keyword-marked (stays
    'merge', NOT 'merg') and 'stream' is override-mapped to 'flow', while
    the rest of the vocabulary Porter-stems normally — df/idf shift for
    every affected term on both sides. OR query over the protected and
    overridden forms."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery

    s = _kwm_engine(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("merge"), Occur.SHOULD), (TermQuery("flow"), Occur.SHOULD)
    )
    return _spark_score_q(s.scored(q))


# ==========================================================================
# JaroWinklerDistance spell ranking (Suggest/Spell/JaroWinklerDistance.cs,
# DirectSpellChecker.Distance seam)
# ==========================================================================
@gate(
    "spell_jaro_winkler",
    SQL_PRELUDE + """
SELECT term, df,
       CAST(floor(jaro_winkler_similarity(term, 'par') * 10000 + 0.5) AS BIGINT) AS sim_q
FROM ts
WHERE term <> 'par' AND damerau_levenshtein(term, 'par') <= 2
ORDER BY sim_q DESC, df DESC, term ASC LIMIT 5
""",
)
def spell_jaro_winkler(spark, sf_dir):
    """DirectSpellChecker with the JaroWinkler IStringDistance: the same
    edit-bounded candidate generation (FuzzyTermsEnum stage), re-ranked by
    the Winkler prefix-boosted Jaro similarity — DuckDB's
    jaro_winkler_similarity implements the same formula (verified term-by-
    term on this vocabulary at 1e-4 quantization)."""
    from lucenenet_spark.search.suggest import spell_suggest

    idx, _, _ = get_engine(spark, sf_dir)
    return spell_suggest(idx, "par", n=5, max_edits=2, distance="jaro_winkler")


# ==========================================================================
# LLM-pipeline: PII scrubbing + Gopher repetition quality signals
# ==========================================================================
from lucenenet_spark.functions.pii import pii_sql_expr  # noqa: E402

_PII_SUFFIX_SQL = (
    "' contact u' || CAST(doc_id % 7 AS VARCHAR) || '@ex' || CAST(doc_id % 5 AS VARCHAR) "
    "|| '.com ssn 123-45-6789 call 555-867-5309 ip 10.0.0.' || CAST(doc_id % 200 AS VARCHAR) "
    "|| ' card 4111 1111 1111 1111 end'"
)


@gate(
    "pii_scrub",
    f"""
WITH docs2 AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS text FROM documents)
SELECT doc_id, {pii_sql_expr("text")} AS text FROM docs2
""",
)
def pii_scrub(spark, sf_dir):
    """PII redaction round-trip: inject deterministic email/SSN/phone/IP/
    card spans, scrub with the typed-tag regexp chain (all JVM-side
    regexp_replace), compare the full scrubbed text against the identical
    RE2 chain in DuckDB."""
    from lucenenet_spark.functions.pii import scrub_pii

    _, _, docs = get_engine(spark, sf_dir)
    docs2 = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"), (F.col("doc_id") % 7).cast("string"),
            F.lit("@ex"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".com ssn 123-45-6789 call 555-867-5309 ip 10.0.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(" card 4111 1111 1111 1111 end"),
        ).alias("text"),
    )
    return scrub_pii(docs2)


@gate(
    "gopher_repetition",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              CAST(count(DISTINCT w) AS BIGINT) AS n_unique
       FROM tok GROUP BY doc_id),
tw AS (SELECT doc_id, max(c) AS top_word
       FROM (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
       GROUP BY doc_id),
bg AS (SELECT a.doc_id, a.w || ' ' || b.w AS bw
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
tb AS (SELECT doc_id, max(c) AS top_big, CAST(sum(c) AS BIGINT) AS n_big
       FROM (SELECT doc_id, bw, count(*) AS c FROM bg GROUP BY doc_id, bw)
       GROUP BY doc_id)
SELECT nt.doc_id, n_tokens, n_unique,
       CAST(floor(10000.0 * top_word / greatest(n_tokens, 1) + 0.5) AS BIGINT) AS top_word_q,
       CAST(floor(10000.0 * coalesce(top_big, 0) / greatest(coalesce(n_big, 0), 1) + 0.5) AS BIGINT) AS top_bigram_q
FROM nt JOIN tw USING (doc_id) LEFT JOIN tb USING (doc_id)
""",
)
def gopher_repetition(spark, sf_dir):
    """Gopher-style repetition signals per document — computed as pure
    per-row array expressions (split + array_sort + aggregate longest-run
    = mode count): ZERO shuffles at any corpus size, vs the oracle's
    classic explode/groupBy formulation."""
    from lucenenet_spark.functions.repetition import repetition_stats

    _, _, docs = get_engine(spark, sf_dir)
    return repetition_stats(docs)


# ==========================================================================
# LongRangeFacetCounts (Facet/Range/RangeFacetCounts.cs): overlapping ranges
# ==========================================================================
@gate(
    "facet_long_ranges",
    SQL_PRELUDE + """,
base AS (SELECT DISTINCT doc_id FROM tokf WHERE term = 'merge'),
j AS (SELECT d.n_chars FROM documents d JOIN base USING (doc_id))
SELECT 'short' AS bucket, CAST(count(*) FILTER (WHERE n_chars < 200) AS BIGINT) AS cnt FROM j
UNION ALL
SELECT 'mid', CAST(count(*) FILTER (WHERE n_chars >= 100 AND n_chars < 400) AS BIGINT) FROM j
UNION ALL
SELECT 'long', CAST(count(*) FILTER (WHERE n_chars >= 300) AS BIGINT) FROM j
""",
)
def facet_long_ranges(spark, sf_dir):
    """Overlapping numeric range facets over the hits of a TermQuery:
    docs in [100,200) count in BOTH 'short' and 'mid' — the reference's
    per-range independent counting, one aggregate pass."""
    from lucenenet_spark.search.collectors import long_range_facet_counts
    from lucenenet_spark.search.queries import TermQuery

    _, s, docs = get_engine(spark, sf_dir)
    return long_range_facet_counts(
        s, TermQuery("merge"), docs, "n_chars",
        [("short", None, 200), ("mid", 100, 400), ("long", 300, None)],
    )


# ==========================================================================
# BlendedInfixSuggester (Suggest/Analyzing/BlendedInfixSuggester.cs)
# ==========================================================================
from lucenenet_spark.plans.gate import _STOPS  # noqa: E402


@gate(
    "blended_infix_suggest",
    """
WITH ent AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface
    FROM documents
  ) GROUP BY surface
),
an AS (
  SELECT surface, weight,
         list_filter(string_split(lower(surface), ' '),
                     x -> x <> '' AND x NOT IN (""" + _STOPS + """)) AS toks
  FROM ent
),
m AS (
  SELECT surface, weight, min(i) - 1 AS minpos
  FROM (SELECT surface, weight, unnest(toks) AS tk,
               generate_subscripts(toks, 1) AS i FROM an)
  WHERE tk LIKE 'key%'
  GROUP BY surface, weight
)
SELECT surface, weight,
       CAST(floor(weight * (1 - 0.10 * minpos)) AS BIGINT) AS score
FROM m ORDER BY score DESC, weight DESC, surface ASC LIMIT 5
""",
)
def blended_infix_suggest(spark, sf_dir):
    """BlendedInfixSuggester POSITION_LINEAR: 'key' matching the FIRST
    token keeps full weight; matching the second is discounted 10% —
    position-blended ranking over the same infix candidate set."""
    from lucenenet_spark.search.suggest import BlendedInfixSuggester

    _, _, docs = get_engine(spark, sf_dir)
    ent = (
        docs.select(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("surface")
        )
        .groupBy("surface")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return BlendedInfixSuggester(ent, blender="linear").lookup("key", 5)


# ==========================================================================
# MultiPassIndexSplitter (Misc/Index/MultiPassIndexSplitter.cs)
# ==========================================================================
_SPLIT_PRELUDE = (
    "WITH docs2 AS (SELECT * FROM documents WHERE doc_id % 2 = 0),\n"
    + SQL_PRELUDE.replace("WITH tok AS", "tok AS").replace(
        "FROM documents", "FROM docs2"
    )
)


@gate(
    "index_split_term",
    _SPLIT_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("vector") + """)
""",
)
def index_split_term(spark, sf_dir):
    """Round-robin shard 0 of 2 is a self-consistent index: df, avgdl,
    maxDoc and therefore every BM25 score reflect ONLY the shard's own
    documents — identical to the reference's per-part FakeDelete merge."""
    from lucenenet_spark.index.splitter import split_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    shard0 = split_index(idx, 2, 0)
    s = IndexSearcher(shard0, mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# HTMLStripCharFilter analogue: binary html -> text extraction roundtrip
# (Analysis/CharFilter/HTMLStripCharFilter.cs; input_hint per-row invariant)
# ==========================================================================
@gate(
    "html_extract_roundtrip",
    "SELECT doc_id, text || ' x & y' AS text FROM documents",
)
def html_extract_roundtrip(spark, sf_dir):
    """Wrap each doc's text in real page chrome (head/script/comment/
    entities), ENCODE to an html:binary column, then extract back through
    the Arrow-batched strip stage — output must equal the plain text plus
    the decoded entity tail, byte-identically per doc."""
    from lucenenet_spark.analysis.html import with_extracted_text

    _, _, docs = get_engine(spark, sf_dir)
    pages = docs.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<html><head><script>var x=1;</script></head>"
                      "<body><!-- c -->"),
                F.col("text"),
                F.lit(" x &amp; y</body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    return with_extracted_text(pages, out_col="text").select("doc_id", "text")


# ==========================================================================
# LLM-pipeline: URL canonicalization + canonical-URL dedup
# ==========================================================================
from lucenenet_spark.functions.urls import canonical_url_sql_expr  # noqa: E402

_URL_SYNTH_SQL = """
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN 'https://www.site' || CAST(doc_id % 5 AS VARCHAR) || '.com/p/'  || CAST(doc_id % 20 AS VARCHAR) || '/'
    WHEN 1 THEN 'HTTPS://SITE'     || CAST(doc_id % 5 AS VARCHAR) || '.COM:443/p/' || CAST(doc_id % 20 AS VARCHAR)
    WHEN 2 THEN 'https://site'     || CAST(doc_id % 5 AS VARCHAR) || '.com/p//' || CAST(doc_id % 20 AS VARCHAR) || '#f'
    ELSE        'https://site'     || CAST(doc_id % 5 AS VARCHAR) || '.com/q/'  || CAST(doc_id % 20 AS VARCHAR)
  END AS url
FROM documents
"""


@gate(
    "url_canonical_dedup",
    f"""
WITH pages AS ({_URL_SYNTH_SQL}),
canon AS (SELECT doc_id, {canonical_url_sql_expr("url")} AS canonical_url FROM pages)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, canonical_url
FROM canon GROUP BY canonical_url
""",
)
def url_canonical_dedup(spark, sf_dir):
    """Canonical-URL dedup over deterministic URL aliases: www prefix,
    uppercase scheme/host, default port, duplicate slashes, fragments and
    trailing slashes all collapse to one canonical form; the first crawl
    (min warc_ts, here monotone in doc_id) survives per canonical URL."""
    from lucenenet_spark.functions.urls import dedup_by_canonical_url

    _, _, docs = get_engine(spark, sf_dir)
    g = (F.col("doc_id") % 5).cast("string")
    k = (F.col("doc_id") % 20).cast("string")
    url = (
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("https://www.site"), g, F.lit(".com/p/"), k, F.lit("/")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("HTTPS://SITE"), g, F.lit(".COM:443/p/"), k))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("https://site"), g, F.lit(".com/p//"), k, F.lit("#f")))
        .otherwise(F.concat(F.lit("https://site"), g, F.lit(".com/q/"), k))
    )
    pages = docs.select(
        "doc_id",
        url.alias("url"),
        F.to_timestamp(F.lit("2026-01-01")).alias("warc_ts"),
    ).withColumn("warc_ts", F.col("warc_ts") + F.make_dt_interval(secs=F.col("doc_id")))
    out = dedup_by_canonical_url(pages)
    return out.select("doc_id", "canonical_url")


# ==========================================================================
# LineDocSource roundtrip (ByTask/Feeds/LineDocSource.cs,
# Tasks/WriteLineDocTask.cs)
# ==========================================================================
_LINEDOC_DIR: dict[str, str] = {}


@gate(
    "linedoc_roundtrip",
    "SELECT doc_id, text FROM documents",
)
def linedoc_roundtrip(spark, sf_dir):
    """Write the corpus in the reference's line-doc benchmark format
    (TAB-separated title/date/body, one doc per line), read it back
    through the LineDocSource reader, and recover (doc_id, text)
    byte-identically — the content-source round trip the reference's
    WriteLineDocTask + LineDocSource pair performs."""
    import tempfile

    from lucenenet_spark.sources import read_linedoc, write_linedoc

    _, _, docs = get_engine(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if key not in _LINEDOC_DIR:
        path = os.path.join(tempfile.mkdtemp(prefix="linedoc_gate_"), "corpus.line")
        write_linedoc(
            docs.select(
                F.col("doc_id").cast("string").alias("title"),
                F.lit("20260101").alias("date"),
                F.col("text").alias("body"),
            ),
            path,
        )
        _LINEDOC_DIR[key] = path
    back = read_linedoc(spark, _LINEDOC_DIR[key])
    return back.select(
        F.col("title").cast("long").alias("doc_id"), F.col("body").alias("text")
    )


# ==========================================================================
# LLM-pipeline: unigram LM quality score (CCNet-style filtering shape)
# ==========================================================================
@gate(
    "lm_unigram_quality",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tokf AS (SELECT doc_id, w FROM tok WHERE w <> ''),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tokf GROUP BY w),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(floor(avg(ln(f.cnt / tot.total)) * 10000 + 0.5) AS BIGINT) AS avg_logprob_q
FROM tokf t JOIN freq f USING (w), tot
GROUP BY t.doc_id
""",
)
def lm_unigram_quality(spark, sf_dir):
    """Mean unigram log-probability per document under the corpus's own
    term distribution — the CCNet LM-filtering shape with the engine's
    frequency table as the model. One corpus pass for the model, one
    token join for the scores."""
    from lucenenet_spark.functions.lm_quality import unigram_logprob

    _, _, docs = get_engine(spark, sf_dir)
    return unigram_logprob(docs)


# ==========================================================================
# Misc token filters: LengthFilter, LimitTokenCountFilter
# (Analysis/Miscellaneous/LengthFilter.cs, LimitTokenCountFilter.cs)
# ==========================================================================
_LEN_PRELUDE = SQL_PRELUDE.replace(
    "WHERE term <> '' AND term NOT IN",
    "WHERE term <> '' AND length(term) BETWEEN 4 AND 8 AND term NOT IN",
)
_LENF_ENGINE: dict[str, tuple] = {}


def _lenf_engine(spark, sf_dir):
    from lucenenet_spark.analysis.miscfilters import FilteredAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _LENF_ENGINE:
        _, _, docs = get_engine(spark, sf_dir)
        idx = build_index(
            docs, analyzer=FilteredAnalyzer(min_length=4, max_length=8)
        ).cache()
        _LENF_ENGINE[key] = IndexSearcher(idx, mode="double")
    return _LENF_ENGINE[key]


@gate(
    "length_filter_term",
    _LEN_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("merge") + """)
""",
)
def length_filter_term(spark, sf_dir):
    """LengthFilter [4,8]: short tokens vanish from the index (holes in
    positions, shorter dl, different df landscape) — BM25 for 'merge'
    must match the length-filtered oracle exactly."""
    from lucenenet_spark.search.queries import TermQuery

    s = _lenf_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merge")))


_LIMIT_PRELUDE = SQL_PRELUDE.replace(
    "post AS (",
    """tokl AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id, term, pos,
           row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
    FROM tokf
  ) WHERE rn <= 30
),
post AS (""",
).replace("FROM tokf GROUP BY doc_id, term", "FROM tokl GROUP BY doc_id, term").replace(
    "(SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id)",
    "(SELECT doc_id, count(*) AS dl FROM tokl GROUP BY doc_id)",
).replace(
    "CAST((SELECT count(*) FROM tokf) AS DOUBLE)",
    "CAST((SELECT count(*) FROM tokl) AS DOUBLE)",
)
_LIMIT_ENGINE: dict[str, tuple] = {}


def _limit_engine(spark, sf_dir):
    from lucenenet_spark.analysis.miscfilters import FilteredAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = os.path.abspath(sf_dir)
    if key not in _LIMIT_ENGINE:
        _, _, docs = get_engine(spark, sf_dir)
        idx = build_index(docs, analyzer=FilteredAnalyzer(limit_tokens=30)).cache()
        _LIMIT_ENGINE[key] = IndexSearcher(idx, mode="double")
    return _LIMIT_ENGINE[key]


@gate(
    "limit_tokens_term",
    _LIMIT_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("merge") + """)
""",
)
def limit_tokens_term(spark, sf_dir):
    """LimitTokenCountFilter(30): every document indexes only its first
    30 emitted tokens (truncated dl/df/tf everywhere) — the title-only /
    head-indexing configuration the reference class exists for."""
    from lucenenet_spark.search.queries import TermQuery

    s = _limit_engine(spark, sf_dir)
    return _spark_score_q(s.scored(TermQuery("merge")))


# ==========================================================================
# NGramDistance spell ranking (Suggest/Spell/NGramDistance.cs, Kondrak 2005)
# ==========================================================================
def _ngram_sim_case() -> str:
    """Oracle CASE table: quantized NGramDistance(2) similarity of every
    corpus-vocabulary term to the query word. The distance function is
    pinned by the reference's own published test vectors (all three n
    sizes, tests/test_classic_wdf.py) — same oracle pattern as the Porter
    stem CASE in gate_modules."""
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB
    from lucenenet_spark.search.distances import ngram_distance

    whens = " ".join(
        f"WHEN '{t}' THEN {int(ngram_distance(t, 'par') * 10000 + 0.5)}"
        for t in _CORPUS_VOCAB
    )
    return f"CASE term {whens} ELSE 0 END"


@gate(
    "spell_ngram_distance",
    SQL_PRELUDE + f"""
SELECT term, df, CAST({_ngram_sim_case()} AS BIGINT) AS sim_q
FROM ts
WHERE term <> 'par' AND damerau_levenshtein(term, 'par') <= 2
ORDER BY sim_q DESC, df DESC, term ASC LIMIT 5
""",
)
def spell_ngram_distance(spark, sf_dir):
    """DirectSpellChecker with the NGramDistance IStringDistance: same
    edit-bounded candidate generation, re-ranked by Kondrak bigram
    similarity."""
    from lucenenet_spark.search.suggest import spell_suggest

    idx, _, _ = get_engine(spark, sf_dir)
    return spell_suggest(idx, "par", n=5, max_edits=2, distance="ngram")


# ==========================================================================
# Geonames source + spatial bbox composition
# (ByTask/Feeds/GeonamesLineParser.cs + Lucene.Net.Spatial bbox semantics)
# ==========================================================================
_GEONAMES_DIR: dict[str, str] = {}


@gate(
    "geonames_bbox",
    """
WITH geo AS (
  SELECT doc_id AS geonameid,
         'place' || CAST(doc_id AS VARCHAR) AS name,
         (doc_id % 121) - 60 + 0.25 AS lat,
         (doc_id % 360) - 180 + 0.25 AS lon
  FROM documents
)
SELECT geonameid, name,
       CAST(floor(lat * 10000 + 0.5) AS BIGINT) AS lat_q,
       CAST(floor(lon * 10000 + 0.5) AS BIGINT) AS lon_q
FROM geo
WHERE lat BETWEEN -10 AND 30 AND lon BETWEEN 20 AND 80
""",
)
def geonames_bbox(spark, sf_dir):
    """Geonames dump lines (synthesized deterministically, written, read
    back through the reference line format) filtered by the spatial bbox
    predicate — the source + spatial composition a gazetteer lookup is."""
    import tempfile

    from lucenenet_spark.search.spatial import bbox_predicate
    from lucenenet_spark.sources import read_geonames

    _, _, docs = get_engine(spark, sf_dir)
    key = os.path.abspath(sf_dir)
    if key not in _GEONAMES_DIR:
        path = os.path.join(tempfile.mkdtemp(prefix="geonames_gate_"), "allCountries")
        lat = (F.col("doc_id") % 121) - 60 + F.lit(0.25)
        lon = (F.col("doc_id") % 360) - 180 + F.lit(0.25)
        lines = docs.select(
            F.concat_ws(
                "\t",
                F.col("doc_id").cast("string"),
                F.concat(F.lit("place"), F.col("doc_id").cast("string")),
                F.lit("ascii"),
                F.lit(""),
                lat.cast("string"),
                lon.cast("string"),
                F.lit("P"),
            ).alias("value")
        )
        lines.coalesce(1).write.mode("overwrite").text(path)
        _GEONAMES_DIR[key] = path
    geo = read_geonames(spark, _GEONAMES_DIR[key])
    hits = geo.filter(
        bbox_predicate("lat", "lon", min_lat=-10, max_lat=30, min_lon=20, max_lon=80)
    )
    q = lambda c: F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")
    return hits.select(
        "geonameid", "name", q("lat").alias("lat_q"), q("lon").alias("lon_q")
    )
