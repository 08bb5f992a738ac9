"""Gate registry part 5q: DSIR importance resampling (LLM-pipeline op).

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
select raw-corpus documents whose hashed-ngram distribution matches a
target domain. Here the target is the corpus's English subset
(lang = 'en') and the raw pool is the whole multilingual corpus — the
canonical DSIR use case (choose web pages that look like the target
domain). The oracle reproduces the entire procedure in SQL: unigram +
adjacent-bigram grams, md5-hex8 bucket hash mod 8192, Laplace-smoothed
bucket models p (target) / q (raw), per-doc log weight
sum cnt*(ln p - ln q), and the deterministic Gumbel top-k draw keyed by
md5('dsir#' || doc_id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _Q,
    _docs_table,
    _spark_score_q,
    _tsc,
    gate,
)

_B = 8192  # hashed feature buckets (functions/dsir.py N_BUCKETS)


def _hex8_of(expr: str) -> str:
    """First 8 hex chars of md5(expr) as a 32-bit integer, digit by digit
    (the strpos idiom shared with gate_pipeline's MinHash oracle)."""
    dig = (
        "(strpos('0123456789abcdef', substr(md5(" + expr + "), {p}, 1)) - 1)"
    )
    return " + ".join(f"({dig.format(p=j + 1)}) * {16 ** (7 - j)}" for j in range(8))


_GUMBEL = (
    "(-ln(-ln((CAST("
    + _hex8_of("'dsir#' || CAST(doc_id AS VARCHAR)")
    + " AS BIGINT) + 1) / 4294967297.0)))"
)

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, lang, term AS gram FROM tok WHERE term <> ''
  UNION ALL
  SELECT a.doc_id, a.lang, a.term || ' ' || b.term AS gram
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term <> '' AND b.term <> ''
),
gb AS (
  SELECT doc_id, lang,
         CAST({_hex8_of('gram')} AS BIGINT) % {_B} AS bucket
  FROM grams
),
counts AS (
  SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM gb GROUP BY doc_id, lang, bucket
),
q AS (SELECT bucket, SUM(cnt) AS qc FROM counts GROUP BY bucket),
p AS (SELECT bucket, SUM(cnt) AS pc FROM counts WHERE lang = 'en' GROUP BY bucket),
qt AS (SELECT CAST(SUM(qc) AS DOUBLE) AS qtot FROM q),
pt AS (SELECT CAST(SUM(pc) AS DOUBLE) AS ptot FROM p),
w AS (
  SELECT c.doc_id,
         SUM(c.cnt * (ln((coalesce(p.pc, 0) + 1) / (pt.ptot + {_B}))
                    - ln((q.qc + 1) / (qt.qtot + {_B})))) AS logw
  FROM counts c JOIN q USING (bucket) LEFT JOIN p USING (bucket), pt, qt
  GROUP BY c.doc_id
)
SELECT doc_id,
       CAST(floor(logw * 10000 + 0.5) AS BIGINT) AS logw_q,
       CAST(floor((logw + {_GUMBEL}) * 10000 + 0.5) AS BIGINT) AS gumbel_q
FROM w
ORDER BY gumbel_q DESC, doc_id ASC
LIMIT 50
"""


@gate("dsir_importance_topk", _DSIR_SQL)
def dsir_importance_topk(spark, sf_dir):
    """The 50 documents DSIR selects from the multilingual raw corpus to
    match the English target subset: Gumbel top-k over Laplace-smoothed
    hashed-ngram log importance weights. Both models are <= 8192 rows
    (broadcast side); the raw pass is one groupBy(id, bucket) plus one
    groupBy(id) — no shuffle grows with the feature space."""
    from lucenenet_spark.functions.dsir import dsir_gumbel_topk

    docs = _docs_table(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    return dsir_gumbel_topk(docs, target, k=50, seed="dsir", n_buckets=_B)


# ==========================================================================
# LLM-pipeline: sequence packing (GPT-style concat-and-chunk) — every
# document's global token offset and first/last training-sequence ids,
# all-integer oracle (a window prefix sum in SQL; the engine runs the
# distributed two-phase scan instead of one serial window).
# ==========================================================================
_PACK_BUDGET = 2048

_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, n_tokens, "offset",
       CAST("offset" // {_PACK_BUDGET} AS BIGINT) AS seq_first,
       CAST(("offset" + greatest(n_tokens, 1) - 1) // {_PACK_BUDGET} AS BIGINT)
         AS seq_last
FROM c
"""


# ==========================================================================
# IndexMergeTool (Misc/Misc/IndexMergeTool.cs, lucene-cli `index merge`):
# two half-corpus indexes SAVED to disk, merged through the tool into a
# destination directory, LOADED back, and served — the on-disk roundtrip
# of AddIndexes + ForceMerge(1). Must equal the one-shot full-build
# oracle because the rebase restores the original ids and stats are
# re-aggregated from the unioned postings.
# ==========================================================================
_MERGETOOL_ENGINE: dict[str, object] = {}


def _mergetool_engine(spark, sf_dir):
    import os as _os
    import tempfile

    from jobs.merge_index_job import merge_saved_indexes
    from lucenenet_spark.index.builder import InvertedIndex, build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _MERGETOOL_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        mid = docs.agg(F.max("doc_id")).collect()[0][0] // 2 + 1
        lo = docs.filter(F.col("doc_id") < mid)
        # per-directory doc numbering, as AddIndexes sees each source
        hi = docs.filter(F.col("doc_id") >= mid).withColumn(
            "doc_id", F.col("doc_id") - F.lit(mid)
        )
        root = tempfile.mkdtemp(prefix="mergetool_gate_")
        a, b, dest = (
            _os.path.join(root, "idx_a"),
            _os.path.join(root, "idx_b"),
            _os.path.join(root, "merged"),
        )
        build_index(lo).save(a)
        build_index(hi).save(b)
        merge_saved_indexes(spark, dest, [a, b])
        _MERGETOOL_ENGINE[key] = IndexSearcher(
            InvertedIndex.load(spark, dest), mode="double"
        )
    return _MERGETOOL_ENGINE[key]


@gate(
    "index_merge_tool_term",
    SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id, {_Q} AS score_q FROM ({_tsc('vector')})
ORDER BY score_q DESC, doc_id ASC LIMIT 10
""",
)
def index_merge_tool_term(spark, sf_dir):
    """Top-10 TermQuery('vector') served from the merge tool's output
    directory (save halves -> merge -> load): row-identical to the
    one-shot full-corpus oracle."""
    from lucenenet_spark.search.queries import TermQuery

    s = _mergetool_engine(spark, sf_dir)
    scored = _spark_score_q(s.scored(TermQuery("vector")))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(10)


# ==========================================================================
# BlockJoinComparatorSource (Misc/Index/Sorter/BlockJoinComparatorSource.cs):
# permute a parent/child block index so blocks order by the parent's sort
# value, children stay before their parent, contiguity preserved. Parents
# are orders (sort: o_totalprice), children their lineitems; old ids are
# synthesized as orderkey*10 (+ linenumber) so both live in one id space.
# ==========================================================================
_BJS_SQL = """
WITH p AS (
  SELECT CAST(o_orderkey * 10 AS BIGINT) AS old_id,
         o_orderkey AS pk, o_totalprice AS psort
  FROM orders
),
c AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS old_id,
         l_orderkey AS pk
  FROM lineitem
),
rows_ AS (
  SELECT old_id, psort, old_id AS pold, 1 AS in_block,
         CAST(0 AS BIGINT) AS csort, TRUE AS is_parent
  FROM p
  UNION ALL
  SELECT c.old_id, p.psort, p.old_id AS pold, 0 AS in_block,
         c.old_id AS csort, FALSE AS is_parent
  FROM c JOIN p USING (pk)
)
SELECT old_id,
       CAST(row_number() OVER (
         ORDER BY psort, pold, in_block, csort, old_id
       ) - 1 AS BIGINT) AS new_id,
       is_parent
FROM rows_
"""


@gate("block_join_sort_permutation", _BJS_SQL)
def block_join_sort_permutation(spark, sf_dir):
    """The BlockJoinComparerSource DocMap over orders (parents, sorted by
    o_totalprice) and their lineitems (children, old-id order): blocks
    stay contiguous, children precede their parent, block order is the
    parent sort. Engine side is one equi-join plus the scalable two-phase
    dense rank; oracle is the equivalent serial window."""
    import os as _os

    from lucenenet_spark.index.sorter import block_join_permutation

    orders = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(_os.path.join(sf_dir, "lineitem.parquet"))
    parents = orders.select(
        (F.col("o_orderkey") * 10).cast("long").alias("doc_id"),
        F.col("o_orderkey").alias("okey"),
        "o_totalprice",
    )
    children = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("doc_id"),
        F.col("l_orderkey").alias("okey"),
    )
    return block_join_permutation(
        parents, children, parent_key="okey", parent_sort="o_totalprice"
    )


@gate("sequence_packing", _PACK_SQL)
def sequence_packing(spark, sf_dir):
    """Concat-and-chunk packing of the corpus into 2048-token training
    sequences: per document, its exclusive-prefix-sum token offset and
    the first/last sequence ids it occupies. The engine computes the
    prefix sum as range-partitioned local cumsums + a bounded
    per-partition offset table (never one serial window)."""
    from lucenenet_spark.functions.packing import pack_stream_offsets

    docs = _docs_table(spark, sf_dir)
    return pack_stream_offsets(docs, budget=_PACK_BUDGET)


# ==========================================================================
# LLM-pipeline: mixture materialization — temperature_weights' repeat
# factors turned into the resampled corpus itself via stochastic rounding
# (floor(r) whole copies + one more iff hash % 10000 < frac(r) in 1e-4
# quanta). The oracle reproduces the tempered weights, the quantized r,
# the per-doc hash draw, and the generate_series expansion.
# ==========================================================================
_MIX_SQL = f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
p AS (SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE), 0.5) AS w FROM c),
z AS (SELECT sum(w) AS z, CAST(sum(n_docs) AS DOUBLE) AS n_total FROM p),
rq AS (
  SELECT p.lang,
         CAST(floor(p.w / z.z * z.n_total / p.n_docs * 10000 + 0.5) AS BIGINT)
           AS r_q
  FROM p, z
),
n AS (
  SELECT d.doc_id, d.lang,
         CAST(r_q // 10000
           + CASE WHEN (CAST({_hex8_of("'mixture#' || CAST(doc_id AS VARCHAR)")}
                         AS BIGINT) % 10000) < (r_q % 10000)
                  THEN 1 ELSE 0 END AS BIGINT) AS n_copies
  FROM documents d JOIN rq USING (lang)
)
SELECT doc_id, lang,
       CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
FROM n
"""


@gate("mixture_materialize", _MIX_SQL)
def mixture_materialize(spark, sf_dir):
    """The alpha=0.5 tempered multilingual mixture materialized over the
    lang column: every surviving (doc, copy) row. Weights table is
    broadcast; the expansion is per-row sequence+explode."""
    from lucenenet_spark.functions.sampling import materialize_mixture

    docs = _docs_table(spark, sf_dir).select("doc_id", "lang")
    out = materialize_mixture(docs, "lang", alpha=0.5, salt="mixture")
    return out.select("doc_id", "lang", F.col("copy").cast("long").alias("copy"))


# ==========================================================================
# LLM-pipeline: the COMPOSED curation funnel (functions/pipeline.curate):
# Gopher rules -> exact dedup first-wins -> LM cut fit on the survivors
# -> deterministic subsample. Each stage is gated on its own elsewhere;
# this gate verifies the composition (ordering + survivor threading +
# audit columns) against one chained CTE oracle.
# ==========================================================================
import math as _math

_CUR_LM_MIN_Q = _math.floor(-3.45 * 10000)

_CURATE_SQL = f"""
WITH tokf0 AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
),
g AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(floor(sum(length(w)) * 1.0 / count(*) * 10000 + 0.5) AS BIGINT)
           AS mwl_q,
         CAST(floor(sum(CASE WHEN regexp_matches(w, '\\p{{L}}') THEN 1 ELSE 0 END)
                    * 1.0 / count(*) * 10000 + 0.5) AS BIGINT) AS alpha_q,
         CAST(sum(CASE WHEN w IN ('the','be','to','of','and','that','have','with')
                  THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
  FROM tokf0 GROUP BY doc_id
),
sym AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text, '[#]|\\.\\.\\.|…', '', 'g'))
           AS n_sym
  FROM documents
),
s1 AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN g USING (doc_id) JOIN sym USING (doc_id)
  WHERE g.n_words BETWEEN 50 AND 100000
    AND g.mwl_q BETWEEN 30000 AND 100000
    AND g.alpha_q >= 8000
    AND g.stop_hits >= 2
    AND CAST(floor(sym.n_sym * 1.0 / greatest(g.n_words, 1) * 10000 + 0.5)
         AS BIGINT) <= 1000
),
keepid AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),
s2 AS (SELECT s1.* FROM s1 JOIN keepid USING (doc_id)),
tokf AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM s2
  ) WHERE w <> ''
),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tokf GROUP BY w),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
lm AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(floor(avg(ln(f.cnt / tot.total)) * 10000 + 0.5) AS BIGINT)
           AS avg_logprob_q
  FROM tokf t JOIN freq f USING (w), tot
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, avg_logprob_q
FROM lm
WHERE avg_logprob_q >= {_CUR_LM_MIN_Q}
  AND (CAST({_hex8_of("'curate#' || CAST(doc_id AS VARCHAR)")} AS BIGINT)
       % 1000000) < 800000
"""


@gate("curation_pipeline", _CURATE_SQL)
def curation_pipeline(spark, sf_dir):
    """The full curation funnel over the corpus with default thresholds:
    survivors with their LM audit columns."""
    from lucenenet_spark.functions.pipeline import curate

    return curate(_docs_table(spark, sf_dir))


# ==========================================================================
# LLM-pipeline: Gopher quality rules (Rae et al. 2021, appendix A) — the
# rule inputs per document, quantized. Pure per-row array arithmetic.
# ==========================================================================
_GOPHER_SQL = """
WITH tokf AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> ''
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(floor(sum(length(w)) * 1.0 / count(*) * 10000 + 0.5) AS BIGINT)
           AS mean_word_len_q,
         CAST(floor(sum(CASE WHEN regexp_matches(w, '\\p{L}') THEN 1 ELSE 0 END)
                    * 1.0 / count(*) * 10000 + 0.5) AS BIGINT) AS alpha_frac_q,
         CAST(sum(CASE WHEN w IN ('the','be','to','of','and','that','have','with')
                  THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
  FROM tokf GROUP BY doc_id
),
sym AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text, '[#]|\\.\\.\\.|…', '', 'g'))
           AS n_sym
  FROM documents
)
SELECT a.doc_id, a.n_words, a.mean_word_len_q, a.alpha_frac_q, a.stop_hits,
       CAST(floor(s.n_sym * 1.0 / greatest(a.n_words, 1) * 10000 + 0.5) AS BIGINT)
         AS symbol_ratio_q
FROM agg a JOIN sym s USING (doc_id)
"""


@gate("gopher_quality_rules", _GOPHER_SQL)
def gopher_quality_rules(spark, sf_dir):
    """The Gopher rule inputs per document (word count, mean word length,
    letter-word fraction, stop-list hits, symbol ratio). Complements the
    gopher_repetition gate (the repetition half of the same rule set).
    Zero-shuffle per-row plan."""
    from lucenenet_spark.functions.quality_rules import gopher_quality_stats

    return gopher_quality_stats(_docs_table(spark, sf_dir))


# ==========================================================================
# LLM-pipeline: C4 line filter (Raffel et al. 2020 §2.2). The flat corpus
# is deterministically re-lined (8-token lines; terminal '.' only when
# (doc_id + line_no) % 3 != 0) so the rule has real structure to act on,
# then: keep lines ending in terminal punctuation with >= 5 words; keep
# pages with >= 3 surviving lines; clean_text = surviving lines rejoined.
# ==========================================================================
_C4_KEEP = (
    "right(line, 1) IN ('.', '!', '?', '\"') "
    "AND len(string_split(line, ' ')) >= 5"
)

_C4_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
lines0 AS (
  SELECT doc_id, line_no,
         string_agg(term, ' ' ORDER BY pos)
           || CASE WHEN (doc_id + line_no) % 3 <> 0 THEN '.' ELSE '' END AS line
  FROM (SELECT doc_id, term, pos, pos // 8 AS line_no FROM tok WHERE term <> '')
  GROUP BY doc_id, line_no
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN {_C4_KEEP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       sum(CASE WHEN {_C4_KEEP} THEN 1 ELSE 0 END) >= 3 AS page_kept,
       coalesce(
         string_agg(CASE WHEN {_C4_KEEP} THEN line END, chr(10) ORDER BY line_no),
         '') AS clean_text
FROM lines0 GROUP BY doc_id
"""


@gate("c4_line_filter", _C4_SQL)
def c4_line_filter(spark, sf_dir):
    """C4's line-level cleaning over the re-lined corpus: per page, the
    line counts, the keep verdict, and the cleaned text. Line synthesis
    and the filter are per-row array expressions — no shuffle."""
    from lucenenet_spark.functions.quality_rules import c4_clean_lines

    docs = _docs_table(spark, sf_dir)
    lined = docs.select(
        "doc_id",
        F.expr(
            """
            array_join(
              transform(
                sequence(0,
                  cast(ceil(size(array_remove(split(text, ' '), '')) / 8.0)
                       as int) - 1),
                i -> concat(
                  array_join(
                    slice(array_remove(split(text, ' '), ''), i * 8 + 1, 8), ' '),
                  case when pmod(doc_id + i, 3) <> 0 then '.' else '' end)
              ), '\n')
            """
        ).alias("text"),
    )
    return c4_clean_lines(lined, min_words=5, min_kept_lines=3)
