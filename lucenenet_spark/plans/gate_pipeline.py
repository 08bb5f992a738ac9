"""Gate registry part 2: large-scale training-data pipeline operators over
the `documents` / `embeddings` tables — dedup (exact, MinHash-LSH, n-gram
Jaccard), text analysis (token counts, quality, language-ID, fingerprints),
and embedding similarity search.

Determinism notes:
- All hash-based ops bottom out in md5 (identical hex output in Spark and
  DuckDB); MinHash uses ONE md5 per term as the 32-bit base hash and a
  shared (a_i*x + b_i) mod P integer permutation table
  (fdedup.minhash_perms) — bit-identical across engines and ~100x cheaper
  than a digest per permutation.
- Ratios/cosines are quantized to bigints (floor(x*10000+0.5)) before
  comparison, and thresshold filters are applied on the quantized value so
  both sides select identical row sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.functions import dedup as fdedup
from lucenenet_spark.functions import similarity as fsim
from lucenenet_spark.functions import textstats as ftext
from lucenenet_spark.plans.gate import SQL_PRELUDE, _STOPS, _docs_table, gate, get_engine

_MINHASH_N = 128  # web-scale parameterization (s-curve threshold ~0.707)
_MINHASH_BANDS = 16  # 8 rows per band
_MAX_BUCKET = 1000  # drop collision-cluster buckets before the pair join
_SHINGLE_DF_CAP = 1000  # drop web-frequent shingles (CommonTermsQuery idea)
_ROWS_PER_BAND = _MINHASH_N // _MINHASH_BANDS


# ==========================================================================
# Deduplication
# ==========================================================================
@gate(
    "dedup_exact",
    """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content (DuplicateFilter analogue,
    reference Lucene.Net.Sandbox/Queries/DuplicateFilter.cs). Map-side
    partial agg; at 100 TB this is a single shuffle on the 128-bit digest."""
    return fdedup.exact_duplicates(_docs_table(spark, sf_dir))


_HEXDIG = "(strpos('0123456789abcdef', substr(md5(shingle), {p}, 1)) - 1)"


def _hex8_sql() -> str:
    """First 8 hex chars of md5(shingle) as a big-endian 32-bit integer —
    the same base hash fdedup.minhash_base computes with F.conv."""
    return " + ".join(
        f"({_HEXDIG.format(p=j + 1)}) * {16 ** (7 - j)}" for j in range(8)
    )


def _lsh_sql_ctes() -> str:
    """Shared CTE chain: raw 3-gram shingles -> df-capped shingles ->
    128-perm MinHash signature -> 16 banded buckets (size-capped) ->
    candidate pairs. Mirrors fdedup.capped_shingles + minhash_lsh_pairs
    exactly: base hash = first 8 md5 hex chars as int, permutations
    (a_i*x + b_i) mod P with the coefficient table imported from fdedup
    (single source of truth), bucket = md5 of the '#'-joined signature
    slice."""
    perms = fdedup.minhash_perms(_MINHASH_N)
    p = fdedup.MINHASH_P
    mins = ",\n         ".join(
        f"min(({a} * x + {b}) % {p}) AS h{i}" for i, (a, b) in enumerate(perms)
    )
    bands = ", ".join(
        "md5(concat_ws('#', "
        + ", ".join(f"h{b * _ROWS_PER_BAND + r}" for r in range(_ROWS_PER_BAND))
        + f")) AS b{b}"
        for b in range(_MINHASH_BANDS)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, b{b} AS bucket FROM sigb" for b in range(_MINHASH_BANDS)
    )
    return f""",
shx AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
),
sh AS (
  SELECT * FROM shx WHERE shingle NOT IN (
    SELECT shingle FROM shx GROUP BY shingle HAVING count(*) > {_SHINGLE_DF_CAP}
  )
),
shb AS (
  SELECT doc_id, CAST({_hex8_sql()} AS BIGINT) AS x FROM sh
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM shb
  GROUP BY doc_id
),
sigb AS (SELECT doc_id, {bands} FROM sig),
bands AS ({band_union}),
bandsf AS (
  SELECT b.* FROM bands b
  JOIN (SELECT band, bucket, count(*) AS sz FROM bands GROUP BY band, bucket) s
    USING (band, bucket)
  WHERE s.sz <= {_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsf a JOIN bandsf b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
)"""


@gate(
    "dedup_minhash_lsh",
    SQL_PRELUDE + _lsh_sql_ctes() + "\nSELECT doc_a, doc_b FROM cand",
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash + LSH banding near-dup candidates (shingle→minhash→band→
    bucket-join). 128 permutations x 16 bands (8 rows/band, s-curve
    threshold ~0.707) over df-capped 3-gram shingles; buckets above
    _MAX_BUCKET docs dropped before the pair join (collision clusters are
    quadratic cost, ~zero precision). The bucket join is the only
    all-to-all shuffle, and it only moves (band, bucket) keys."""
    sh = fdedup.capped_shingles(_docs_table(spark, sf_dir), n=3, df_cap=_SHINGLE_DF_CAP)
    return fdedup.minhash_lsh_pairs(
        sh.withColumnRenamed("shingle", "term"),
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        max_bucket_size=_MAX_BUCKET,
    )


@gate(
    "dedup_ngram_jaccard",
    SQL_PRELUDE + _lsh_sql_ctes() + """,
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b,
       CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5) AS BIGINT) AS jacc_q
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5) AS BIGINT) >= 8000
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """3-gram shingle Jaccard ≥ 0.8 as the exact VERIFY stage over LSH
    candidate pairs (never an all-pairs shingle self-join): work is
    O(candidate pairs x shingles per doc), df-capped shingle stream."""
    return fdedup.ngram_jaccard_pairs(
        _docs_table(spark, sf_dir),
        n=3,
        threshold_q=8000,
        shingle_df_cap=_SHINGLE_DF_CAP,
        n_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
    )


# ==========================================================================
# Text analysis
# ==========================================================================
@gate(
    "token_counts",
    SQL_PRELUDE + """
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       dl.dl AS n_terms,
       CAST(coalesce(u.n, 0) AS BIGINT) AS n_unique_terms
FROM documents d
JOIN dl USING (doc_id)
LEFT JOIN (SELECT doc_id, count(DISTINCT term) AS n FROM tokf GROUP BY doc_id) u USING (doc_id)
""",
)
def token_counts(spark, sf_dir):
    """Token counting: raw whitespace tokens, analyzed terms, distinct terms."""
    idx, _, docs = get_engine(spark, sf_dir)
    return ftext.token_counts(docs, idx)


@gate(
    "quality_stats",
    f"""
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
st AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, t -> t IN ({_STOPS}))) AS BIGINT) AS n_stop
  FROM raw
)
SELECT doc_id, n_tokens,
       CAST(floor(CAST(n_stop AS DOUBLE) / n_tokens * 10000 + 0.5) AS BIGINT) AS stop_ratio_q
FROM st WHERE n_tokens > 0
""",
)
def quality_stats(spark, sf_dir):
    """Quality scoring: length + stopword-ratio signals."""
    return ftext.quality_stats(_docs_table(spark, sf_dir))


@gate(
    "language_id",
    f"""
WITH raw AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CASE WHEN len(toks) > 0
                 AND CAST(len(list_filter(toks, t -> t IN ({_STOPS}))) AS DOUBLE)
                     / len(toks) >= 0.02
            THEN 'en' ELSE 'unknown' END AS lang_pred
FROM raw
""",
)
def language_id(spark, sf_dir):
    """Heuristic language-ID: English stopword density (n-gram LM stub)."""
    return ftext.language_id(_docs_table(spark, sf_dir))


@gate(
    "doc_fingerprint",
    """
SELECT doc_id, md5(text) AS fingerprint FROM documents
""",
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting (content-hash identity)."""
    return ftext.doc_fingerprints(_docs_table(spark, sf_dir))


# ==========================================================================
# Embedding similarity search
# ==========================================================================
@gate(
    "cosine_topk",
    """
WITH e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
q AS (SELECT i, v FROM e WHERE vec_id = 0),
d AS (
  SELECT e.vec_id, sum(e.v * q.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN q USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM q)
SELECT d.vec_id,
       CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) AS cos_q
FROM d, qn
ORDER BY cos_q DESC, d.vec_id ASC LIMIT 10
""",
)
def cosine_topk_gate(spark, sf_dir):
    """Brute-force cosine top-k over array<float> embeddings via the
    scale-safe plan: collect the 1-row query vector, then a single narrow
    scan with a codegen'd zip_with/aggregate dot product + TakeOrdered —
    no posexplode shuffle (N x dim rows) anywhere."""
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    ]
    return fsim.cosine_topk_arrays_q(emb, qvec, k=10)
