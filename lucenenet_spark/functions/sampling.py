"""Deterministic sampling for training-data pipelines.

Mixture construction over a web corpus — "keep 50% of English, 20% of
German, 5% of the tail" — needs a sampler that is (a) deterministic
across reruns and cluster sizes (no RNG state, no partition-order
dependence), (b) cheap (one digest per row, no shuffle), and (c)
auditable (the keep/drop decision is a pure function of the row key).
The standard construction is hash-mod sampling: a uniform 32-bit hash
of (salt, id) compared against a per-stratum integer threshold.

- :func:`sample_hash` — first 8 hex chars of ``md5(salt # id)`` as a
  bigint, the repo's one cross-engine digest (same convention as
  dedup.minhash_base); uniform on [0, 2^32).
- :func:`deterministic_sample` — corpus-wide fraction.
- :func:`stratified_sample` — per-stratum fractions (mixture weights),
  one CASE expression, zero shuffles: the filter is embedded in the
  scan, so at 100 TB this prunes rows before anything else runs.
- :func:`split_train_holdout` — disjoint train/holdout split from the
  same hash (a row's split never changes when data is added, the
  property random-split lacks).

Changing ``salt`` draws an independent sample; fractions are quantized
to 1e-6 (integer threshold) so Spark and any SQL oracle agree exactly.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions._tracked import RoundScope

_SETCOVER_SCOPE = RoundScope()

__all__ = [
    "sample_hash",
    "deterministic_sample",
    "stratified_sample",
    "split_train_holdout",
    "temperature_weights",
    "deterministic_shuffle",
    "materialize_mixture",
]

_DENOM = 1_000_000


def sample_hash(id_col: Column, salt: str = "") -> Column:
    """Uniform 32-bit hash of (salt, id): first 8 hex chars of
    md5('salt#id') as a bigint."""
    key = F.concat(F.lit(salt), F.lit("#"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(round(fraction * _DENOM))


def deterministic_sample(
    docs: DataFrame, fraction: float, *, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, decided by hash(salt, id) — rerun-stable
    and independent of partitioning."""
    bucket = sample_hash(F.col(id_col), salt) % F.lit(_DENOM)
    return docs.filter(bucket < F.lit(_threshold(fraction)))


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash-mod sampling: mixture weighting in one scan.

    `fractions` maps stratum value -> keep fraction; unlisted strata get
    `default_fraction`. The per-row threshold is a single CASE column, so
    the whole operation is a pushdown-friendly filter with no shuffle and
    no per-stratum passes (contrast df.sampleBy, which is seeded but
    partition-order sensitive).
    """
    thresh = F.lit(_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == value, F.lit(_threshold(frac))).otherwise(
            thresh
        )
    bucket = sample_hash(F.col(id_col), salt) % F.lit(_DENOM)
    return docs.filter(bucket < thresh)


def split_train_holdout(
    docs: DataFrame,
    holdout_fraction: float,
    *,
    id_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """(train, holdout) disjoint split on the same hash: a row is holdout
    iff bucket < threshold, train otherwise — stable under corpus growth."""
    bucket = sample_hash(F.col(id_col), salt) % F.lit(_DENOM)
    t = F.lit(_threshold(holdout_fraction))
    return docs.filter(bucket >= t), docs.filter(bucket < t)


def temperature_weights(
    docs: DataFrame,
    group_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature (alpha) mixture re-weighting over a grouping column —
    the multilingual-pretraining sampler (p_i ∝ c_i^alpha; exponentiated
    upsampling of tails, introduced for mBERT/XLM-R-style corpora and
    standard in 100-TB mixture construction).

    Returns one row per group: (group, n_docs, p [the alpha-tempered
    sampling probability], repeat_factor [p * N / c_i — the expected
    per-doc duplication under the tempered mixture; > 1 means the tail
    group is upsampled]).

    alpha=1 recovers proportional sampling (repeat_factor == 1
    everywhere); alpha=0 is uniform-over-groups. The aggregate is
    group-cardinality-sized (languages, sources) — metadata scale, so the
    cross-join of the normalizer is a broadcast of one row."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    powed = counts.withColumn("w", F.pow(F.col("n_docs").cast("double"), F.lit(alpha)))
    norm = powed.agg(
        F.sum("w").alias("z"), F.sum("n_docs").cast("double").alias("n_total")
    )
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            group_col,
            "n_docs",
            (F.col("w") / F.col("z")).alias("p"),
            (F.col("w") / F.col("z") * F.col("n_total") / F.col("n_docs")).alias(
                "repeat_factor"
            ),
        )
    )


def deterministic_shuffle(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    key_out: str = "shuffle_key",
) -> DataFrame:
    """Reproducible global shuffle for training-order randomization:
    ORDER BY hash(salt, id). The permutation is a pure function of
    (salt, id) — stable across reruns, cluster sizes and partitioning —
    so an interrupted pipeline resumes with the identical order, and a
    different epoch is just a different salt. The sort is the one
    unavoidable shuffle; downstream writers keep the order via
    sortWithinPartitions semantics of the range-partitioned sort."""
    key = sample_hash(F.col(id_col), salt)
    return docs.withColumn(key_out, key).orderBy(key_out, F.col(id_col))


def materialize_mixture(
    docs: DataFrame,
    group_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "mixture",
    id_col: str = "doc_id",
    copy_col: str = "copy",
) -> DataFrame:
    """The tempered mixture made concrete: the resampled corpus itself.

    Each document repeats ``floor(r)`` times plus one more with
    probability ``frac(r)``, where r is :func:`temperature_weights`'
    repeat_factor for its group and the fractional draw is a
    deterministic per-doc hash (stochastic rounding — the expected copy
    count equals r exactly, and reruns are bit-identical). Documents in
    over-represented groups (r < 1) survive with probability r; tail
    groups are upsampled with a 1-based ``copy_col`` numbering each
    repetition.

    Determinism across engines: r is quantized to 1e-4 FIRST, then all
    arithmetic is integer (r_q // 10000 whole copies; the extra copy iff
    hash % 10000 < r_q % 10000), so the only float op near a boundary is
    the one quantization every gate already relies on.

    Scale: the weights table is group-cardinality-sized (broadcast); the
    expansion is a per-row sequence+explode bounded by ceil(max r) — no
    shuffle beyond temperature_weights' metadata aggregate."""
    w = temperature_weights(docs, group_col, alpha=alpha).select(
        group_col,
        F.floor(F.col("repeat_factor") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("_r_q"),
    )
    u = sample_hash(F.col(id_col), salt) % F.lit(10000)
    n_copies = (
        (F.col("_r_q") / F.lit(10000)).cast("long")
        + F.when(u < F.col("_r_q") % F.lit(10000), F.lit(1)).otherwise(F.lit(0))
    ).cast("int")
    expanded = (
        docs.join(F.broadcast(w), group_col)
        .withColumn("_n", n_copies)
        .withColumn(
            copy_col,
            F.explode(
                F.when(
                    F.col("_n") >= 1, F.sequence(F.lit(1), F.col("_n"))
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("_r_q", "_n")
    )
    return expanded


def greedy_set_cover(
    sets: DataFrame,
    rounds: int = 8,
    set_col: str = "doc_id",
    elem_col: str = "shingle",
) -> DataFrame:
    """Greedy maximum-coverage selection (Nemhauser, Wolsey & Fisher
    1978: the greedy algorithm for submodular maximization achieves
    1 - 1/e of the optimum) — the coverage-maximizing data-selection
    primitive: pick, round by round, the document whose element set
    covers the most still-uncovered elements.  This is the submodular
    subset-selection shape used for diversity-driven training-data
    curation.

    Deterministic: gain DESC, set id ASC.  No driver collect — each
    round's winner stays a one-row DataFrame (the BPE winner pattern)
    broadcast into the next round's anti-join; the covered-element
    frame is persisted per round so round r+1 scans rounds, not the
    corpus.  Output one row per round: (round, doc_id, gain,
    covered_total).

    Scale: each round is one anti-join + one groupBy over the element
    table — O(rounds) linear passes; at production scale rounds is the
    selection budget, the classic lazy-greedy/CELF accelerations slot
    in front of the same plan.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    _SETCOVER_SCOPE.begin()
    # persisted: every round's gain scan AND its winner's coverage
    # expansion re-read this frame (2 reads x rounds), so the dedup'd
    # element table materializes once instead of re-exploding the corpus
    sets = _SETCOVER_SCOPE.track(
        sets.select(F.col(set_col).alias("sid"), F.col(elem_col).alias("elem"))
        .distinct()
    )
    covered = None  # DataFrame of ("elem"), None = empty
    chosen = None   # DataFrame of ("sid")
    out = None
    for r in range(1, rounds + 1):
        remaining = sets if covered is None else sets.join(covered, "elem", "left_anti")
        if chosen is not None:
            remaining = remaining.join(chosen, "sid", "left_anti")
        winner = (
            remaining.groupBy("sid")
            .agg(F.count("*").cast("long").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("sid"))
            .limit(1)
        )
        winner = _SETCOVER_SCOPE.track(winner)
        new_cov = sets.join(F.broadcast(winner.select("sid")), "sid").select("elem")
        covered = _SETCOVER_SCOPE.track(
            (new_cov if covered is None else covered.unionByName(new_cov)).distinct()
        )
        chosen_row = winner.select("sid")
        chosen = chosen_row if chosen is None else chosen.unionByName(chosen_row)
        total = covered.agg(F.count("*").cast("long").alias("covered_total"))
        row = (
            winner.crossJoin(total)
            .select(
                F.lit(r).cast("long").alias("round"),
                F.col("sid").alias("doc_id"),
                "gain",
                "covered_total",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
