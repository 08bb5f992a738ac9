"""Deterministic HyperLogLog cardinality estimation (Flajolet, Fusy,
Gandouet & Meunier, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007).

Why a hand-rolled HLL when Spark has approx_count_distinct: (a) the
register state here is an auditable DataFrame — shippable across
engines, mergeable across days/shards by a plain max-groupBy, exactly
how a 100 TB pipeline maintains rolling distinct-term/URL counts
without ever rescanning history; (b) the hash is the engine-standard
md5, so the SAME estimate is reproducible bit-for-bit in Spark, DuckDB,
or anything else that can md5 — Spark's implementation is a JVM
black box with its own seed.

Determinism contract: 64 hash bits come from the first 16 md5 hex
chars; p register-index bits, the rank is 1 + leading zeros of the
remaining (64 - p) bits (capped at 64 - p + 1).  Registers are exact
integers; the raw estimate alpha_m * m^2 / sum(2^-M_j) and the
small-range linear-counting correction (m * ln(m/V) when E <= 2.5m and
empty registers exist) are evaluated in one double expression from
integer sums, then quantized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_P = 9  # 512 registers, ~4.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(values: DataFrame, col: str, p: int = DEFAULT_P) -> DataFrame:
    """(bucket, reg): the HLL register table for one string column.

    hash64 = first 16 md5 hex chars as a 64-bit value (computed as two
    32-bit halves to stay in non-negative bigint range); bucket = top p
    bits; rank = leading zeros of the remaining bits + 1.
    """
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")
    hexs = F.md5(F.col(col).cast("binary"))
    hi = F.conv(F.substring(hexs, 1, 8), 16, 10).cast("long")  # bits 63..32
    lo = F.conv(F.substring(hexs, 9, 8), 16, 10).cast("long")  # bits 31..0
    bucket = F.shiftright(hi, 32 - p)
    # remaining 64-p bits as a bigint: low (32-p) bits of hi, then lo
    rest = (hi - F.shiftleft(bucket, 32 - p)) * F.lit(2**32) + lo
    # rank = 1 + leading zeros = width + 1 - bit_length(rest); bit
    # length via the binary-string trick (exact integer — log2 on a
    # >2^53 bigint would be 1-ulp fragile across engines)
    width = 64 - p
    bits = F.length(F.conv(F.col("rest").cast("string"), 10, 2)).cast("long")
    rank = F.when(
        F.col("rest") > 0, F.lit(width + 1) - bits
    ).otherwise(F.lit(width + 1))
    return (
        values.select(bucket.alias("bucket"), rest.alias("rest"))
        .withColumn("rank", rank.cast("long"))
        .groupBy("bucket")
        .agg(F.max("rank").cast("long").alias("reg"))
    )


def hll_estimate(registers: DataFrame, p: int = DEFAULT_P) -> DataFrame:
    """One row (m, v_empty, est_q): the HLL estimate from a register
    table, small-range corrected, quantized to a bigint.

    sum(2^-reg) is accumulated as TWO exact integer sums (regs <= 30
    scaled by 2^31, deeper regs by 2^61 — a single scale would overflow
    int64 at 512 x 2^60), each divided by its exact power-of-two scale,
    added in a fixed order: engine-order independent, and only the
    final formula runs in double.
    """
    m = 1 << p
    alpha = _alpha(m)
    agg = registers.agg(
        F.count("*").cast("long").alias("n_filled"),
        F.sum(
            F.when(
                F.col("reg") <= 30,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(31 - reg AS INT))"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("s_a"),
        F.sum(
            F.when(
                F.col("reg") > 30,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(61 - reg AS INT))"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("s_b"),
    )
    v_empty = F.lit(m) - F.col("n_filled")
    # empty registers contribute 2^-0 = 1 each
    denom = (
        F.col("s_a").cast("double") / F.lit(float(2**31))
        + F.col("s_b").cast("double") / F.lit(float(2**61))
    ) + v_empty.cast("double")
    raw = F.lit(alpha * m * m) / denom
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v_empty.cast("long").alias("v_empty"),
        F.floor(corrected + F.lit(0.5)).cast("long").alias("est_q"),
    )


def weighted_sample(
    docs: DataFrame,
    weight_col: str = "n_chars",
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006): each item
    draws a key u^(1/w) with u uniform in (0,1); the k largest keys ARE
    a weighted sample without replacement.  One pass, no state beyond
    the top-k heap — the standard way a pipeline draws a
    quality-weighted training subset from 10^12 candidates.

    Determinism: u comes from the first 8 md5 hex chars of the doc id
    ((h + 1) / (2^32 + 1), never 0 or 1), so the "random" draw is
    reproducible in any engine.  Keys compare in log space
    (ln(u)/w — monotone in the key, numerically safer), quantized 1e9.
    Output: (rank, doc_id, weight, key_q9), rank 1..k by key desc.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(2**32) + 1.0)
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w  # maximize u^(1/w) == maximize ln(u)/w (ln(u) < 0)
    keyed = docs.filter(F.col(weight_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.col(weight_col).cast("long").alias("weight"),
        F.floor(key * F.lit(1e9) + F.lit(0.5)).cast("long").alias("key_q9"),
    )
    win = Window.orderBy(F.desc("key_q9"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(win).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "weight", "key_q9")
    )


CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_sketch(
    values: DataFrame, col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    stream summary: the count-min sketch and its applications", J.
    Algorithms 2005) over a value stream: (row, bucket, cnt) with
    depth x width integer counters.  Like hll_registers, the state is
    a plain mergeable DataFrame (merge = groupBy sum) built on
    engine-portable md5 row hashes — the rolling per-shard term/URL
    frequency summary whose point queries never rescan history.

    hash_j(v) = first 8 md5 hex chars of "<j>#<v>" mod width; every
    count is an exact bigint, so estimates are bit-identical anywhere.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(str(j)), F.lit("#"), F.col(col)
                                ).cast("binary")
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        values.select(F.explode(rows).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "term",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates: (value, est) with est = min over the
    depth counters each probe hashes to — an overestimate by at most
    the collision noise bound (e/width x stream length, w.p. 1-delta).
    """
    hashed = probes.select(
        F.col(col).alias("value"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(str(j)), F.lit("#"), F.col(col)
                                        ).cast("binary")
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("value", "rb.row", "rb.bucket")
    return (
        hashed.join(sketch, ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries, "Finding Repeated Elements",
# Sci. Comput. Program. 1982; merge rule from Agarwal et al., "Mergeable
# Summaries", PODS'12) — the deterministic counter-based sketch beside
# the randomized CMS (cms_sketch above).
# --------------------------------------------------------------------------


def misra_gries_summary(
    tokens: DataFrame,
    k: int = 8,
    n_partitions: int = 4,
    term_col: str = "term",
    id_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Distributed Misra-Gries: per-partition k-counter sketches merged
    by the PODS'12 rule.

    Each partition (doc_id % n_partitions) folds its token stream in the
    canonical (doc_id, pos) order through the classic k-counter update
    (new term on a full table decrements every counter, zeros drop out);
    the per-partition summaries are then summed per term and reduced
    back to k entries by subtracting the (k+1)-th largest combined
    count.  Guarantee (the twin asserts it): every term with true count
    > N/(k+1) appears in the merged summary, and each kept estimate
    undercounts by at most N/(k+1).

    Scale: pass one touches each token once inside its partition (the
    Arrow-batched fold state is k counters, constant memory); the merge
    moves only n_partitions*k rows.  This is the sketch half of the
    two-pass heavy-hitter pipeline (certified_heavy_hitters).
    """
    import pandas as pd

    def _mg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([id_col, pos_col])
        counters: dict[str, int] = {}
        for t in pdf[term_col]:
            if t in counters:
                counters[t] += 1
            elif len(counters) < k:
                counters[t] = 1
            else:
                for key in list(counters):
                    counters[key] -= 1
                    if counters[key] == 0:
                        del counters[key]
        return pd.DataFrame(
            {"term": list(counters), "cnt": [counters[t] for t in counters]}
        )

    parts = tokens.withColumn("_pk", F.col(id_col) % n_partitions)
    summaries = parts.groupBy("_pk").applyInPandas(_mg, "term string, cnt long")
    combined = summaries.groupBy("term").agg(F.sum("cnt").cast("long").alias("cnt"))
    # reduce to k entries: subtract the (k+1)-th largest count (0 if <= k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = combined.withColumn("_r", F.row_number().over(w))
    kth = ranked.filter(F.col("_r") == k + 1).select(
        F.col("cnt").alias("_sub")
    )
    return (
        ranked.crossJoin(
            kth.unionByName(
                ranked.sparkSession.createDataFrame([(0,)], "_sub long")
            ).agg(F.max("_sub").alias("_sub"))
        )
        .select("term", (F.col("cnt") - F.col("_sub")).alias("mg_count"))
        .filter(F.col("mg_count") > 0)
    )


def certified_heavy_hitters(
    tokens: DataFrame,
    k: int = 8,
    n_partitions: int = 4,
    term_col: str = "term",
    id_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Two-pass exact heavy hitters: Misra-Gries candidates, then an
    exact recount of ONLY the candidates, keeping terms with true count
    strictly above N/(k+1) (integer cross-multiplied).

    The output is exactly ``SELECT term, count(*) ... HAVING
    count*(k+1) > N`` — but pass two counts only the <= k surviving
    candidate terms instead of the whole vocabulary, which is the
    point at 10^9 distinct terms.  Completeness rests on the MG
    guarantee that no heavy term can be evicted from the summary.
    """
    cand = misra_gries_summary(
        tokens, k=k, n_partitions=n_partitions,
        term_col=term_col, id_col=id_col, pos_col=pos_col,
    ).select("term")
    n_total = tokens.groupBy().agg(F.count("*").cast("long").alias("n_total"))
    exact = (
        tokens.join(F.broadcast(cand), tokens[term_col] == cand["term"])
        .groupBy(cand["term"])
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    return (
        exact.crossJoin(n_total)
        .filter(F.col("true_count") * (k + 1) > F.col("n_total"))
        .select("term", "true_count", "n_total")
    )
