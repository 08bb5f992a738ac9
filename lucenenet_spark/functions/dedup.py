"""Deduplication operators for web-scale corpora.

Exact dedup, MinHash+LSH banding, and n-gram-shingle Jaccard — each as a
declarative DataFrame plan (single shuffle per stage, map-side partial
aggregation, no driver-side loops), designed so the same plan runs on
10^12 documents:

- exact: shuffle on a 128-bit digest — uniformly distributed keys, no skew;
- minhash: per-doc signatures are a bounded-size aggregate (n_hashes mins);
  the LSH band bucket-join only shuffles (band, bucket) keys, and buckets
  larger than `max_bucket_size` are dropped BEFORE the pair join — a huge
  bucket is a banding collision cluster (quadratic pair blow-up, near-zero
  precision), so capping it bounds the worst reducer at
  max_bucket_size^2 pairs per bucket;
- jaccard: exact Jaccard is a VERIFY stage over LSH candidate pairs (join
  candidates to each side's shingle set — work is O(sum over pairs of doc
  shingles), never a global shingle self-join). The standalone all-pairs
  form exists for small corpora but df-caps the shingle stream first:
  without the cap, any web-frequent shingle ("new york times"-class,
  df=M) emits M^2 rows in one reducer. The df-cap mirrors the reference's
  heavy-term mitigation (CommonTermsQuery df cutoff,
  src/Lucene.Net.Queries/CommonTermsQuery.cs:69-98).

The reference's only dedup surface is DuplicateFilter
(Lucene.Net.Sandbox/Queries/DuplicateFilter.cs) — exact term-keyed dedup;
the near-dup family generalizes it for training-data pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Persisted-intermediate lifecycle.  The dedup builders return LAZY plans, so
# they cannot unpersist in a try/finally themselves (the caller's action
# happens later).  Instead every internal .persist() is tracked in a bounded
# LRU registry KEYED BY PLAN SEMANTICS: a repeated invocation over the same
# input produces a semantically identical plan, which Spark's CacheManager
# resolves to the SAME InMemoryRelation — so the registry returns the
# already-tracked frame instead of adding a duplicate entry (a naive FIFO of
# DataFrame objects held several handles to one shared cache entry, and
# evicting an old handle unpersisted the relation the CURRENT query was
# reading — observed as a 2.4x bench regression).  Genuinely different plans
# rotate through _MAX_LIVE slots, so executor storage across a long-lived
# session stays bounded at ~_MAX_LIVE intermediates instead of growing
# forever.  _MAX_LIVE = 3 because one ngram_jaccard_pairs call persists at
# most 3 distinct intermediates (capped shingle base, verify-stage shingles,
# band buckets) — eviction can never touch the in-flight call's own frames.
# Callers that want deterministic cleanup call release_intermediates() after
# their action; acting on a plan whose cache was evicted by newer distinct
# work is still correct, just recomputes.
from collections import OrderedDict

# ---------------------------------------------------------------------------
_MAX_LIVE = 3
_INTERMEDIATES: "OrderedDict[int, DataFrame]" = OrderedDict()


def _track(df: DataFrame) -> DataFrame:
    h = df.semanticHash()
    cur = _INTERMEDIATES.get(h)
    if cur is not None:
        if df.sameSemantics(cur):
            _INTERMEDIATES.move_to_end(h)
            return cur  # same plan -> same cache entry; refresh LRU position
        cur.unpersist()  # hash collision with a different plan: replace
        del _INTERMEDIATES[h]
    df.persist()
    _INTERMEDIATES[h] = df
    while len(_INTERMEDIATES) > _MAX_LIVE:
        _, old = _INTERMEDIATES.popitem(last=False)
        old.unpersist()
    return df


def release_intermediates() -> None:
    """Unpersist every live dedup intermediate (call after your action)."""
    while _INTERMEDIATES:
        _, old = _INTERMEDIATES.popitem(last=False)
        old.unpersist()


# ---------------------------------------------------------------------------
# Result-plan memo.  Building the minhash plan costs real DRIVER time: the
# signature aggregation is 128 agg expressions, and Catalyst re-analyzes +
# re-canonicalizes that whole tree on EVERY fresh invocation (semanticHash,
# cache lookup, analysis are all O(plan size)) — measured ~2.3 s per call at
# sf1.0, dwarfing the ~0.5 s the executed stages take.  Identical repeated
# invocations therefore return the SAME DataFrame object (its analyzed
# QueryExecution is memoized by Spark per Dataset), keyed by the INPUT
# plan's semantics + the parameters; a stored entry is verified with
# sameSemantics (cheap: the input plan is small) before reuse, so a hash
# collision can never return a wrong plan.  A memoized Dataset's compiled
# physical plan references the internal frames' InMemoryRelations, so an
# entry is only reusable while those frames are still LIVE in the _track
# registry: if any was evicted (LRU churn or release_intermediates), the
# entry is dropped and the plan rebuilt fresh — paying the one-time
# analysis again, never executing against a stale cache reference.  This
# memoizes PLANS, never results — every action still executes the query
# against the live caches.
_PLAN_MEMO_MAX = 16
_PLAN_MEMO: "OrderedDict[tuple, tuple[DataFrame, DataFrame, tuple[DataFrame, ...]]]" = (
    OrderedDict()
)


def _plan_memo_get(key: tuple, inp: DataFrame) -> DataFrame | None:
    hit = _PLAN_MEMO.get(key)
    if hit is None:
        return None
    stored_inp, result, internals = hit
    if not inp.sameSemantics(stored_inp):
        del _PLAN_MEMO[key]  # 32-bit semanticHash collision: rebuild
        return None
    for frame in internals:
        live = _INTERMEDIATES.get(frame.semanticHash())
        if live is None or live is not frame:
            del _PLAN_MEMO[key]  # internal cache evicted: rebuild fresh
            return None
    _PLAN_MEMO.move_to_end(key)
    for frame in internals:
        _track(frame)  # LRU-refresh
    return result


def _plan_memo_put(
    key: tuple, inp: DataFrame, result: DataFrame, internals: tuple[DataFrame, ...]
) -> None:
    _PLAN_MEMO[key] = (inp, result, internals)
    while len(_PLAN_MEMO) > _PLAN_MEMO_MAX:
        _PLAN_MEMO.popitem(last=False)

# Web-scale defaults: 128 permutations x 16 bands (8 rows/band) puts the
# LSH s-curve threshold at (1/16)^(1/8) ~= 0.707 — candidates are likely
# >= 0.7-Jaccard pairs, verified exactly afterwards.
DEFAULT_MINHASH_N = 128
DEFAULT_MINHASH_BANDS = 16
DEFAULT_MAX_BUCKET = 1000
DEFAULT_SHINGLE_DF_CAP = 1000


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, n_dups, keep_doc_id)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).cast("long").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct n-gram token shingles per doc: (doc_id, shingle).

    One narrow pass: split once, slide an n-window with transform over the
    token array (no position self-joins, no shuffle before the distinct) —
    the ShingleFilter shape (Analysis.Common/Analysis/Shingle) as a Column
    expression.
    """
    toks = F.split(F.col(text_col), " ")
    k = F.size(toks) - F.lit(n - 1)  # number of n-windows
    sh = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def capped_shingles(
    docs: DataFrame,
    n: int = 3,
    df_cap: int = DEFAULT_SHINGLE_DF_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shingles minus the web-frequent ones (document frequency > df_cap).

    A common shingle carries ~zero near-dup signal but O(df^2) join cost;
    dropping it is the CommonTermsQuery df-cutoff idea applied to dedup.
    """
    sh = _track(shingles(docs, n=n, text_col=text_col, id_col=id_col))
    heavy = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    # No forced broadcast: the heavy-shingle set grows with the corpus (at
    # 10^12 docs it can exceed driver memory); AQE picks broadcast when the
    # aggregated side is actually small, else a shuffle anti-join.
    return sh.join(heavy, "shingle", "left_anti")


# Universal-hash permutation family (the Spark MinHashLSH / Broder shape):
# one base digest per term, then h_i(x) = (a_i*x + b_i) mod P in plain
# 64-bit integer arithmetic.  a_i < 2^30 and x < 2^32 keep a*x+b well under
# 2^63 (DuckDB BIGINT is overflow-checked), P prime > 2^32.
MINHASH_P = 4294967311
_A_MOD = 1073741789  # prime < 2^30 bounding the multipliers


def minhash_perms(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) coefficient table — the single source of
    truth for BOTH the Spark pipeline and the DuckDB gate oracle."""
    return [
        ((2654435761 * (i + 1)) % _A_MOD, (2246822519 * (i + 1)) % MINHASH_P)
        for i in range(n_hashes)
    ]


def minhash_base(term: F.Column) -> F.Column:
    """32-bit base hash: first 8 hex chars of md5(term) as an integer —
    md5 is the one digest Spark and DuckDB compute identically."""
    return F.conv(F.substring(F.md5(term.cast("binary")), 1, 8), 16, 10).cast("long")


def minhash_signatures(terms: DataFrame, n_hashes: int = DEFAULT_MINHASH_N) -> DataFrame:
    """Per-doc MinHash signature columns h0..h{n-1}.

    ONE md5 per (doc, term) row for the base hash, then n_hashes integer
    permutations (a_i*x + b_i) mod P — 128 cheap bigint ops instead of 128
    digest calls per row (the md5-per-permutation variant spent ~90% of
    the dedup wall time inside md5).  Signature entry = min over the doc's
    distinct term set (set semantics, tf-independent).
    """
    distinct = terms.select("doc_id", "term").distinct()
    x = minhash_base(F.col("term"))
    aggs = [
        F.min((F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_perms(n_hashes))
    ]
    return distinct.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    terms: DataFrame,
    n_hashes: int = DEFAULT_MINHASH_N,
    bands: int = DEFAULT_MINHASH_BANDS,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH candidate pairs (doc_a < doc_b) from banded MinHash signatures.

    Buckets larger than max_bucket_size are dropped before pair expansion
    (collision clusters: quadratic cost, no precision) — the worst single
    bucket contributes at most max_bucket_size^2 candidate rows.
    """
    key = ("minhash_lsh_pairs", terms.semanticHash(), n_hashes, bands, max_bucket_size)
    memo = _plan_memo_get(key, terms)
    if memo is not None:
        return memo
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(terms, n_hashes)
    # ONE pass over sig: all band buckets as an array-of-structs, exploded —
    # a per-band select + union would recompute the n_hashes-column
    # signature aggregation once per band (and twice more in the pair join)
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        # '#'-joined integer signature slice (concat_ws stringifies longs
        # identically in Spark and DuckDB); md5 only to keep the bucket key
        # fixed-width — bands * n_docs digests, not per-posting cost
        bucket = F.md5(F.concat_ws("#", *cols).cast("binary"))
        band_structs.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    bands_base = _track(
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )
    bands_df = bands_base
    if max_bucket_size is not None:
        big = (
            bands_df.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("band", "bucket")
        )
        # unforced: an oversized-bucket set is usually tiny but is corpus-
        # dependent — AQE chooses broadcast vs shuffle anti-join at runtime
        bands_df = bands_df.join(big, ["band", "bucket"], "left_anti")
        # After the cap, every surviving bucket holds <= max_bucket_size
        # doc ids, so collecting a bucket's ids is a BOUNDED aggregate and
        # the a<b pairs expand inside whole-stage codegen: ONE shuffle
        # (groupBy) instead of the two a self-join would pay, and no
        # sort-merge of the bucket key (guide §2.3/2.4).  Identical pair
        # set: ids are unique within a bucket (one row per doc per band).
        grouped = (
            bands_df.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        pair_arr = F.flatten(
            F.transform(
                F.col("ids"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ids"),
                        i + F.lit(2),
                        F.greatest(F.size(F.col("ids")) - i - F.lit(1), F.lit(0)),
                    ),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
        out = (
            grouped.select(F.explode(pair_arr).alias("p"))
            .select(F.col("p.doc_a"), F.col("p.doc_b"))
            .distinct()
        )
    else:
        # uncapped: bucket sizes are unbounded, so a bounded collect_list is
        # not safe — fall back to the shuffle self-join, whose reducers
        # stream instead of buffering a whole bucket
        a = bands_df.alias("a")
        b_ = bands_df.alias("b")
        out = (
            a.join(
                b_,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    _plan_memo_put(key, terms, out, (bands_base,))
    return out


def jaccard_verify(
    sh: DataFrame,
    candidates: DataFrame,
    threshold_q: int = 8000,
) -> DataFrame:
    """Exact quantized Jaccard restricted to candidate pairs.

    Work is bounded by sum over candidate pairs of shingle-set sizes —
    never an all-pairs shingle join. Returns (doc_a, doc_b, jacc_q) with
    jacc_q = floor(J*10000+0.5) >= threshold_q.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b"])
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jacc = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    jacc_q = F.floor(jacc * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jacc_q.alias("jacc_q"))
        .filter(F.col("jacc_q") >= threshold_q)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold_q: int = 8000,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    shingle_df_cap: int | None = DEFAULT_SHINGLE_DF_CAP,
    n_hashes: int = DEFAULT_MINHASH_N,
    bands: int = DEFAULT_MINHASH_BANDS,
) -> DataFrame:
    """n-gram-shingle Jaccard near-dup pairs with quantized similarity.

    Scale path (default): LSH candidate generation (minhash_lsh_pairs) then
    jaccard_verify over the candidates — O(candidates x doc size), never
    all-pairs. Pass `candidates` to verify an externally supplied pair set.
    The shingle stream is df-capped first (see capped_shingles).
    """
    sh = (
        capped_shingles(docs, n=n, df_cap=shingle_df_cap, text_col=text_col, id_col=id_col)
        if shingle_df_cap is not None
        else shingles(docs, n=n, text_col=text_col, id_col=id_col)
    )
    sh = _track(sh)
    if candidates is None:
        candidates = minhash_lsh_pairs(
            sh.withColumnRenamed("shingle", "term"), n_hashes=n_hashes, bands=bands
        )
    return jaccard_verify(sh, candidates, threshold_q=threshold_q)


def simhash64(terms: DataFrame, tf_col: str | None = "tf", n_bits: int = 60) -> DataFrame:
    """SimHash per doc from (doc_id, term[, tf]) rows (n_bits <= 60).

    Bit i of the fingerprint is the sign of sum over terms of
    weight * (bit_i(md5(term)) ? +1 : -1), where bit i indexes the 60-bit
    integer int(md5hex[0:15], 16) LSB-first. All-integer arithmetic —
    engine-portable (conv hex -> bigint, JVM-side) and exactly
    reproducible in SQL.
    """
    w = F.col(tf_col).cast("long") if tf_col else F.lit(1).cast("long")
    h = F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 15), 16, 10).cast("long")
    t = terms.select("doc_id", h.alias("h60"), w.alias("w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h60"), i).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{i}")
        for i in range(n_bits)
    ]
    agg = t.groupBy("doc_id").agg(*bit_sums)
    fp = reduce(
        lambda acc, i: acc
        + F.when(F.col(f"s{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long")),
        range(n_bits),
        F.lit(0).cast("long"),
    )
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_duplicates(
    terms: DataFrame,
    *,
    n_bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
    tf_col: str | None = "tf",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """All pairs (doc_a < doc_b) within Hamming distance max_hamming of
    each other's SimHash fingerprint — the Manku/Jain/Das Sarma WWW'07
    near-duplicate detector ("Detecting Near-Duplicates for Web
    Crawling" §3: permuted-table lookup ≙ band equi-join).

    Pigeonhole: split the n_bits fingerprint into n_bands contiguous
    bands; two fingerprints differing in <= max_hamming bits agree
    EXACTLY on at least one band whenever n_bands >= max_hamming + 1,
    so a per-band equi-join loses no true pair. The join shuffles on
    (band, band_value) keys only — never all-pairs — and, like
    minhash_lsh_pairs, buckets larger than max_bucket_size are dropped
    before the self-join (a degenerate band value shared by k docs costs
    k^2 candidate rows and at web scale is boilerplate, not content).
    At the 60-bit default each band is 15 bits (32k values), so bucket
    sizes concentrate at n_docs/32768 per band.

    Returns (doc_a, doc_b, hamming) with hamming <= max_hamming.
    """
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"pigeonhole requires n_bands >= max_hamming + 1; "
            f"got n_bands={n_bands}, max_hamming={max_hamming}"
        )
    if n_bits % n_bands:
        raise ValueError(f"n_bits={n_bits} must divide evenly into n_bands={n_bands}")
    width = n_bits // n_bands
    mask = (1 << width) - 1
    fp = _track(simhash64(terms, tf_col=tf_col, n_bits=n_bits))
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("bval"),
        )
        for b in range(n_bands)
    ]
    bands_df = _track(
        fp.select("doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bb")).select(
            "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval")
        )
    )
    if max_bucket_size is not None:
        big = (
            bands_df.groupBy("band", "bval")
            .agg(F.count(F.lit(1)).alias("sz"))
            .filter(F.col("sz") > max_bucket_size)
            .select("band", "bval")
        )
        bands_df = bands_df.join(big, ["band", "bval"], "left_anti")
    a = bands_df.alias("a")
    b_ = bands_df.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("long")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    *,
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    The dense-vector analogue of minhash_lsh_pairs: each vector gets an
    n_planes sign signature (SimHash over deterministic hyperplanes,
    similarity.hyperplanes); the signature splits into n_bands bands and
    two vectors become a candidate pair iff they agree on some whole band
    (collision probability per band = (1 - theta/pi)^(n_planes/n_bands),
    so recall at a given cosine is tunable by the band shape exactly as in
    minhash banding). Candidates then get an EXACT cosine (codegen'd
    zip_with fold, no UDF) and pairs below `threshold` are dropped —
    LSH only ever costs recall, never precision.

    Scale shape (the same three defenses as the minhash path): the
    band-bucket join shuffles only (band, 4-bit key) pairs; buckets larger
    than `max_bucket_size` are dropped BEFORE the pair join (an LSH bucket
    that big is a collision cluster — quadratic pairs, near-zero
    precision); candidate ids are deduplicated across bands BEFORE the
    vectors are re-joined, so each surviving pair fetches its two
    dim-float arrays exactly once. Threshold comparison happens on the
    1e-4-quantized value so any SQL oracle agrees exactly at the boundary.

    Returns (id_a, id_b, cos_q) with id_a < id_b, cos_q = cosine * 1e4
    rounded, cos_q >= round(threshold * 1e4).
    """
    from lucenenet_spark.functions.similarity import hyperplanes

    if n_planes % n_bands:
        raise ValueError(f"n_bands={n_bands} must divide n_planes={n_planes}")
    planes = hyperplanes(n_planes, seed, dim)

    def dot(plane: list[float]):
        qlit = F.array(*[F.lit(float(x)) for x in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col), qlit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sig = F.concat(*[F.when(dot(p) >= 0, "1").otherwise("0") for p in planes])
    width = n_planes // n_bands
    band_keys = F.array(
        *[
            F.concat(F.lit(f"{b}|"), F.substring(F.col("sig"), b * width + 1, width))
            for b in range(n_bands)
        ]
    )
    buckets = (
        emb.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))
        .select("vec_id", F.explode(band_keys).alias("bkey"))
    )
    if max_bucket_size is not None:
        ok = (
            buckets.groupBy("bkey")
            .agg(F.count(F.lit(1)).alias("bn"))
            .filter(F.col("bn") <= max_bucket_size)
            .select("bkey")
        )
        buckets = buckets.join(ok, "bkey")
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), "bkey")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pair = cand.join(va, "id_a").join(vb, "id_b")

    def fold(prod):
        return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)

    dot_ab = fold(F.zip_with(F.col("va"), F.col("vb"), lambda a, b: a.cast("double") * b))
    n2a = fold(F.zip_with(F.col("va"), F.col("va"), lambda a, b: a.cast("double") * b))
    n2b = fold(F.zip_with(F.col("vb"), F.col("vb"), lambda a, b: a.cast("double") * b))
    cos_q = F.floor(dot_ab / F.sqrt(n2a * n2b) * F.lit(10000.0) + F.lit(0.5)).cast("long")
    return (
        pair.select("id_a", "id_b", cos_q.alias("cos_q"))
        .filter(F.col("cos_q") >= F.lit(int(round(threshold * 10000))))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup candidate PAIRS into dedup GROUPS: connected
    components over the undirected pair graph, component id = min node id.

    Pair-based removal is order-dependent on chains (A-B, B-C can drop
    both B and C or neither); the production answer (RefinedWeb/SlimPajama
    pipelines) is one representative per component. Algorithm: iterative
    min-label propagation — each round every node takes the min of its own
    label and its neighbors' labels, converging in O(component diameter)
    rounds. Near-dup clusters are near-cliques (diameter 2-3 in practice),
    so a handful of rounds suffices; for adversarial long-chain graphs at
    scale, swap in large-star/small-star (Kiveris et al., SoCC'14) behind
    the same signature. Convergence is detected by a label-sum checksum
    (one scalar agg per round, which also materializes the iterate).
    Each round's iterate is localCheckpoint-ed: iterative DataFrame
    algorithms otherwise nest the previous round's plan inside the next
    (the round-N logical plan embeds round N-1's), and Catalyst analysis
    of that exponentially growing tree OOMs the DRIVER long before the
    data is large — lineage truncation every round is the standard fix
    (swap in reliable `checkpoint()` with a checkpoint dir when executor
    loss must be survivable).

    Returns (node, component) for every node that appears in `pairs`."""
    e1 = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e1.union(e1.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return labels


def near_duplicate_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """The deduplicated corpus: one representative per near-duplicate
    component (the min-id member), plus every document that appears in
    no candidate pair.

    This is the operation production pipelines actually run after pair
    finding (RefinedWeb §3.2 / SlimPajama keep-one-per-cluster):
    pair-based removal is order-dependent on chains, so resolution goes
    through connected components, then ONE left-anti join of the corpus
    against the non-canonical members — no per-pair deletes, no driver
    materialization of the cluster list.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def crossdoc_span_stats(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-span detection (ExactSubstr-style, after
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): for every document, how many of its n-token spans also
    occur verbatim in at least one OTHER document.

    Returns one row per doc: (doc_id, total_ngrams, dup_ngrams) — integer
    counts, where dup_ngrams counts n-gram POSITIONS whose gram appears
    in >= 2 distinct docs (repeated occurrences each count). Downstream
    policy (drop doc when dup_ngrams/total_ngrams > tau, or strip the
    covered spans) composes on top.

    Scale shape: n-gram construction is ZERO-shuffle — a per-row
    higher-order-function pass (split -> transform -> md5 over each
    n-token slice) in whole-stage codegen, no window function and no
    self-join. The only shuffles are the groupBy(gram) distinct-doc
    count (map-side partial agg first) and the left-semi join of
    positions against the duplicated-gram set. Grams are keyed by md5
    (shared with the DuckDB oracle); at 100 TB swap the key to
    xxhash64 to cut shuffle width 4x, and rely on AQE skew-join for
    boilerplate grams (the df-cap idea from capped_shingles applies:
    a gram in >max_df docs is "duplicated" by definition and can be
    short-circuited into the semi-join set without carrying its
    full posting).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_pos = _track(docs.select(F.col(id_col), F.explode(grams).alias("h")))
    dup_h = (
        per_pos.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    tot = per_pos.groupBy(id_col).agg(F.count(F.lit(1)).alias("total_ngrams"))
    dup = (
        per_pos.join(dup_h, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dup_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(tot, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            F.coalesce("total_ngrams", F.lit(0)).cast("long").alias("total_ngrams"),
            F.coalesce("dup_ngrams", F.lit(0)).cast("long").alias("dup_ngrams"),
        )
    )


def strip_duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ExactSubstr REMOVAL transform (Lee et al. 2022): rewrite each
    document with every n-token span that also occurs verbatim in
    another document stripped out. Returns (doc_id, clean_text) — docs
    that are entirely boilerplate (e.g. exact duplicates) come back as
    the empty string; docs shorter than n tokens pass through unchanged.

    Plan: the same zero-shuffle per-row gram pass as
    :func:`crossdoc_span_stats`, posexploded WITH the span start
    position; duplicated grams found by one groupBy; the surviving
    start-position list per doc is collected (bounded by the doc's own
    token count) and the rewrite is a per-row filter with an index
    lambda — token j is dropped iff some duplicated span start s covers
    it (s <= j < s+n) — entirely in whole-stage codegen, no UDF.

    The rewrite is O(tokens x duplicated_starts) per row, which is only
    pathological for long documents that are themselves near-complete
    duplicates (starts ~ tokens). The practical pipeline removes those
    first — exact_duplicates / minhash drop whole-doc copies, and
    crossdoc_span_stats(dup==total) identifies all-boilerplate docs —
    leaving this transform the sparse-overlap tail it is linear on.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = _track(docs.select(F.col(id_col), toks.alias("_toks"), grams.alias("_g")))
    per_pos = base.select(id_col, F.posexplode("_g").alias("pos", "h"))
    dup_h = (
        per_pos.groupBy("h")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    starts = (
        per_pos.join(dup_h, "h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_starts"))
    )
    s_arr = F.coalesce(F.col("_starts"), F.array().cast("array<integer>"))
    kept = F.filter(
        F.col("_toks"),
        lambda x, j: ~F.exists(s_arr, lambda s: (j >= s) & (j < s + F.lit(n))),
    )
    return base.join(starts, id_col, "left").select(
        id_col, F.concat_ws(" ", kept).alias("clean_text")
    )


def lsh_quality_audit(
    docs: DataFrame,
    jaccard_threshold_ppm: int = 500_000,
    n: int = 3,
    df_cap: int = DEFAULT_SHINGLE_DF_CAP,
    n_hashes: int = DEFAULT_MINHASH_N,
    bands: int = DEFAULT_MINHASH_BANDS,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Precision/recall audit of the MinHash-LSH candidate generator
    against exact shingle Jaccard — the tuning harness behind every
    (n_hashes, bands) choice: the banding s-curve (Broder 1997;
    Leskovec/Rajaraman/Ullman ch.3 analysis) trades recall at the
    threshold against candidate-set size, and this measures BOTH on the
    live corpus instead of trusting the formula.

    Ground truth = exact Jaccard >= threshold over the SAME df-capped
    shingle sets LSH sees (integer cross-multiplication, no float
    compare); candidates = the production minhash_lsh_pairs call.
    All-pairs exact truth is O(docs^2) in the worst case — this is an
    offline audit on a sample, not a pipeline stage (the pipeline's
    scalable verify is the LSH-candidates-only Jaccard pass).

    Output one row: (n_truth, n_cand, tp, precision_ppm, recall_ppm).
    """
    sh = capped_shingles(docs, n=n, df_cap=df_cap)
    cand = minhash_lsh_pairs(
        sh.withColumnRenamed("shingle", "term"),
        n_hashes=n_hashes,
        bands=bands,
        max_bucket_size=max_bucket_size,
    ).select("doc_a", "doc_b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("nsz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nsz", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nsz", "nb"), "doc_b")
        .filter(
            F.col("inter") * F.lit(1_000_000)
            >= F.lit(jaccard_threshold_ppm) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select("doc_a", "doc_b")
    )
    tp = truth.join(cand, ["doc_a", "doc_b"]).count()
    n_truth = truth.count()
    n_cand = cand.count()
    spark = docs.sparkSession
    prec = (tp * 1_000_000) // n_cand if n_cand else 0
    rec = (tp * 1_000_000) // n_truth if n_truth else 0
    return spark.createDataFrame(
        [(n_truth, n_cand, tp, prec, rec)],
        "n_truth long, n_cand long, tp long, precision_ppm long, recall_ppm long",
    )


def prefix_filter_pairs(
    docs: DataFrame,
    n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT Jaccard similarity self-join via prefix filtering
    (Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search",
    WWW'07; Xiao et al. PPJoin, WWW'08) — the exact counterpart to the
    MinHash-LSH candidate path.

    Every shingle set is ordered by the CANONICAL global order
    (document frequency ascending, shingle ascending — rarest first);
    for threshold t = t_num/t_den a pair with J(x,y) >= t must share at
    least one shingle inside each side's PREFIX of length
    p = s - ceil(t*s) + 1, so joining ONLY the prefixes loses no true
    pair.  Because the prefix holds each document's RAREST shingles,
    the join buckets are the low-df tail of the vocabulary — the
    "new york times"-class heavy shingles that make a naive shingle
    self-join quadratic never enter the candidate stream.  A length
    filter (t*max(sa,sb) <= min(sa,sb), integer cross-multiplied)
    prunes candidates before the verify.  Verification is the exact
    intersection count restricted to candidate pairs, so the output is
    EXACTLY the pairs with J >= t — no banding false negatives.

    All arithmetic is integer-exact: J >= t  <=>  i*(t_den+t_num) >=
    t_num*(sa+sb), and jacc_q4 = floor(i/u*1e4+0.5) is computed as
    (20000*i + u) DIV (2*u).

    Scale: the per-doc prefix is computed with a partition-by-doc
    window (no global sort — the canonical order is the (df, shingle)
    TUPLE, which needs no dense global rank); the candidate join keys
    are rare shingles, so bucket sizes stay small by construction.
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("s"))
    sdf = sh.groupBy("shingle").agg(F.count("*").cast("long").alias("sdf"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("sdf"), F.asc("shingle"))
    ranked = (
        sh.join(sdf, "shingle")
        .withColumn("idx", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    # p = s - ceil(t*s) + 1, ceil(t*s) = (t_num*s + t_den - 1) DIV t_den
    p = F.col("s") - F.expr(f"({t_num} * s + {t_den} - 1) DIV {t_den}") + F.lit(1)
    pref = ranked.filter(F.col("idx") <= p).select("doc_id", "shingle", "s")
    a = pref.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("s").alias("sa")
    )
    b = pref.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("s").alias("sb")
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.lit(t_den) * F.least("sa", "sb") >= F.lit(t_num) * F.greatest("sa", "sb")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    xa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    xb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(xa, "doc_a")
        .join(xb, "doc_b")
        .filter(F.col("shingle") == F.col("shingle_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    u = F.col("sa") + F.col("sb") - F.col("inter")
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(F.col("inter") * F.lit(t_den + t_num) >= F.lit(t_num) * (F.col("sa") + F.col("sb")))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            u.cast("long").alias("uni"),
            F.expr(
                "(20000 * inter + (sa + sb - inter)) DIV (2 * (sa + sb - inter))"
            )
            .cast("long")
            .alias("jacc_q4"),
        )
    )
