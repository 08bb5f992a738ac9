"""Gate registry round-5 part v: sharded serving (TopDocs.Merge +
static impact pruning), winnowing fingerprint dedup, doc-id layout
compressibility, and the sitemap crawl-source roundtrip.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _tsc,
    gate,
    get_engine,
)

# ----------------------------------------------------------------------
# shard_merge_topk — per-shard top-k over contiguous doc_id slices, then
# TopDocs.Merge (TopDocs.cs MergeSortQueue: score DESC, shardIndex ASC,
# local doc ASC).  Contiguous docBase slices make the merged order equal
# the global (score DESC, doc ASC) order, so the oracle is simply the
# global top-k with the shard id recomputed from the slice arithmetic.
# ----------------------------------------------------------------------
_SHARDS = 4
_SHARD_K = 10

_SHARD_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
hits AS (
  SELECT doc_id, CAST(floor(sum(score) * 10000 + 0.5) AS BIGINT) AS score_q
  FROM (({_tsc('vector')}) UNION ALL ({_tsc('merge')}))
  GROUP BY doc_id
),
nn AS (
  SELECT CAST(ceil(count(*) / {_SHARDS}.0) AS BIGINT) AS span FROM documents
)
SELECT CAST(row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS BIGINT) AS rank,
       CAST(floor(doc_id / nn.span) AS BIGINT) AS shard_id,
       doc_id, score_q
FROM hits, nn
ORDER BY score_q DESC, doc_id ASC LIMIT {_SHARD_K}
"""


@gate("shard_merge_topk", _SHARD_SQL)
def shard_merge_topk(spark, sf_dir):
    """Distributed fan-out/merge page (TopDocs.Merge over docBase
    slices) for the OR query vector|merge — provably identical to the
    single-searcher page; only shards x k rows cross the merge."""
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
    from lucenenet_spark.search.sharded import shard_merge_topk as _smt

    _, s, _ = get_engine(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery("vector"), Occur.SHOULD), (TermQuery("merge"), Occur.SHOULD)
    )
    return _smt(s, q, n_shards=_SHARDS, k=_SHARD_K)


# ----------------------------------------------------------------------
# static_prune_topk — Carmel SIGIR'01 static top-m impact pruning: the
# pruned index (m=16 postings kept per term, global stats untouched)
# answers the single-term top-10 IDENTICALLY to the full index, which is
# exactly what the oracle computes (full-index top-k; it never sees the
# pruned store).  df('query') ~ 400 at gate scale, so ~96% of that
# term's postings are gone from the serving store.
# ----------------------------------------------------------------------
_PRUNE_M = 16
_PRUNE_K = 10
_PRUNE_TERM = "query"

_PRUNE_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f"""
SELECT doc_id,
       CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM ({_tsc(_PRUNE_TERM)})
ORDER BY score_q DESC, doc_id ASC LIMIT {_PRUNE_K}
"""


@gate("static_prune_topk", _PRUNE_SQL)
def static_prune_topk(spark, sf_dir):
    """Top-10 term query served from the statically pruned (top-16
    impacts per term) index — rank- and score-identical to the full
    index because survivors keep global stats."""
    from pyspark.sql import functions as F

    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher
    from lucenenet_spark.search.sharded import prune_index_topm

    idx, _, _ = get_engine(spark, sf_dir)
    pruned = prune_index_topm(idx, m=_PRUNE_M)
    s = IndexSearcher(pruned, mode="double")
    top = s.search(TermQuery(_PRUNE_TERM), k=_PRUNE_K)
    return top.select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_q"),
    )


# ----------------------------------------------------------------------
# winnowing_pairs — Schleimer SIGMOD'03 winnowing: k-gram (k=4) md5
# hashes, per-window (w=5) minima as fingerprints, bucket-capped pair
# join.  Oracle replays gram construction, the hex8 hash, the window
# minimum (ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING), the short-doc
# degenerate window, the bucket cap, and the pair aggregation.
# ----------------------------------------------------------------------
_WIN_K = 4
_WIN_W = 5
_WIN_MIN_SHARED = 2
_WIN_MAX_BUCKET = 64

_HEX8_GRAM = " + ".join(
    f"((strpos('0123456789abcdef', substr(md5(gram), {j + 1}, 1)) - 1) * {16 ** (7 - j)})"
    for j in range(8)
)

_WINNOW_SQL = f"""
WITH nodes AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, u.j AS j,
         array_to_string(toks[u.j:u.j + {_WIN_K - 1}], ' ') AS gram
  FROM nodes, unnest(generate_series(1, greatest(length(toks) - {_WIN_K - 1}, 0))) AS u(j)
),
hashes AS (
  SELECT doc_id, j, {_HEX8_GRAM} AS h FROM grams
),
winmin AS (
  SELECT doc_id, j,
         count(*) OVER (PARTITION BY doc_id) AS num_h,
         min(h) OVER (PARTITION BY doc_id ORDER BY j
                      ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS fp
  FROM hashes
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin
  WHERE j - 1 <= greatest(num_h - {_WIN_W}, 0)
),
capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS bucket_n FROM fps
  ) WHERE bucket_n <= {_WIN_MAX_BUCKET}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {_WIN_MIN_SHARED}
"""


@gate("winnowing_pairs", _WINNOW_SQL)
def winnowing_pairs(spark, sf_dir):
    """Winnowing (MOSS) fingerprint near-dup candidates: local-substring
    overlap detection, bucket-capped before the pair join."""
    from lucenenet_spark.functions.winnowing import winnow_fingerprints, winnow_pairs
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    fps = winnow_fingerprints(docs, k=_WIN_K, w=_WIN_W)
    return winnow_pairs(
        fps, min_shared=_WIN_MIN_SHARED, max_bucket_size=_WIN_MAX_BUCKET
    )


# ----------------------------------------------------------------------
# docid_gap_stats — Silvestri ECIR'07: posting delta bit cost under the
# engine's URL-sorted doc-id assignment vs a deterministic md5 scramble
# of the same ids.  Exact integers end to end (bit cost = length of the
# binary string of each gap).
# ----------------------------------------------------------------------
_GAPS_SQL = SQL_PRELUDE + """,
perm AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT)
           AS scrambled_id
  FROM documents
),
both_ids AS (
  SELECT 'url_order' AS ordering, term, doc_id AS id FROM post
  UNION ALL
  SELECT 'scrambled', p.term, pe.scrambled_id FROM post p JOIN perm pe USING (doc_id)
),
gaps AS (
  SELECT ordering, id - lag(id) OVER (PARTITION BY ordering, term ORDER BY id) AS gap
  FROM both_ids
)
SELECT ordering,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(length(bin(gap))) AS BIGINT) AS total_bits,
       CAST(floor(sum(length(bin(gap))) * 1000.0 / count(*)) AS BIGINT)
         AS milli_bits_per_gap
FROM gaps WHERE gap IS NOT NULL
GROUP BY ordering
"""


@gate("docid_gap_stats", _GAPS_SQL)
def docid_gap_stats(spark, sf_dir):
    """Delta-compression bit cost of the postings under the real id
    assignment vs an id scramble — the measurement behind SURVEY §1.1's
    URL-sorted docID decision."""
    from lucenenet_spark.functions.docid_layout import docid_gap_stats as _dgs

    idx, _, _ = get_engine(spark, sf_dir)
    return _dgs(idx)


# ----------------------------------------------------------------------
# sitemap_coverage — sitemaps.org roundtrip: render one <urlset> per
# host, parse it back with regexp_extract_all, audit against the corpus.
# Oracle computes the expected audit directly from documents; any parse
# or render defect breaks counts or the lastmod range.
# ----------------------------------------------------------------------
_SITEMAP_SQL = """
SELECT source AS host,
       CAST(count(*) AS BIGINT) AS n_listed,
       CAST(count(*) AS BIGINT) AS n_matched,
       min('2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
           || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')) AS first_lastmod,
       max('2024-' || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
           || '-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')) AS last_lastmod
FROM documents GROUP BY source
"""


@gate("sitemap_coverage", _SITEMAP_SQL)
def sitemap_coverage(spark, sf_dir):
    """Sitemap publish -> parse -> coverage audit, entirely in
    whole-stage codegen (regexp extraction, no XML library)."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.sources.sitemaps import (
        parse_sitemaps,
        sitemap_coverage as _cov,
        synth_sitemaps,
    )

    docs = _docs_table(spark, sf_dir)
    return _cov(parse_sitemaps(synth_sitemaps(docs)), docs)
