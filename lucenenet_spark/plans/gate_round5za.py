"""Gate registry round-5 part za: mergeable-sketch cardinality (HLL),
weighted reservoir sampling, and per-host boilerplate detection.
"""

from __future__ import annotations

from lucenenet_spark.functions.sketches import DEFAULT_P, _alpha
from lucenenet_spark.plans.gate import gate


def _hex_int_sql(col: str, start: int) -> str:
    """8 md5 hex chars of `col` starting at `start` (1-based) as a
    bigint — the strpos trick shared with the MinHash oracles."""
    return " + ".join(
        f"((strpos('0123456789abcdef', substr(md5({col}), {start + j}, 1)) - 1)"
        f" * {16 ** (7 - j)})"
        for j in range(8)
    )


# ----------------------------------------------------------------------
# hll_distinct_terms — Flajolet et al. AofA'07 HyperLogLog over the raw
# token stream, p=9 (512 registers): the mergeable rolling-distinct
# sketch a pipeline keeps per day/shard.  Register ranks use the exact
# bit-length trick; the indicator sum is an exact bigint (2^(61-reg));
# one double formula at the end, small-range corrected.  The row also
# carries the TRUE distinct count so the artifact shows the estimate
# honestly (~4.6% stderr at p=9).
# ----------------------------------------------------------------------
_HLL_P = DEFAULT_P
_HLL_M = 1 << _HLL_P
_HLL_AMM = _alpha(_HLL_M) * _HLL_M * _HLL_M
_W = 64 - _HLL_P


def _hll_sql() -> str:
    two61 = 2**61
    return f"""
WITH tokn AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
hp AS (
  SELECT ({_hex_int_sql('w', 1)}) AS hi, ({_hex_int_sql('w', 9)}) AS lo
  FROM tokn
),
br AS (
  SELECT (hi >> {32 - _HLL_P}) AS bucket,
         (hi - ((hi >> {32 - _HLL_P}) << {32 - _HLL_P})) * 4294967296 + lo AS rest
  FROM hp
),
rk AS (
  SELECT bucket,
         CASE WHEN rest > 0 THEN {_W + 1} - length(bin(rest))
              ELSE {_W + 1} END AS rank
  FROM br
),
regs AS (SELECT bucket, CAST(max(rank) AS BIGINT) AS reg FROM rk GROUP BY bucket),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_filled,
         CAST(sum(CASE WHEN reg <= 30
                  THEN CAST(1 AS BIGINT) << CAST(31 - reg AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS s_a,
         CAST(sum(CASE WHEN reg > 30
                  THEN CAST(1 AS BIGINT) << CAST(61 - reg AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS s_b
  FROM regs
),
est AS (
  SELECT ({_HLL_M} - n_filled) AS v_empty,
         {_HLL_AMM!r} / ((CAST(s_a AS DOUBLE) / {float(2**31)!r}
                          + CAST(s_b AS DOUBLE) / {float(two61)!r})
                         + CAST({_HLL_M} - n_filled AS DOUBLE)) AS raw
  FROM agg
)
SELECT CAST({_HLL_M} AS BIGINT) AS m,
       CAST(v_empty AS BIGINT) AS v_empty,
       CAST(floor(
         CASE WHEN raw <= {2.5 * _HLL_M!r} AND v_empty > 0
              THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / CAST(v_empty AS DOUBLE))
              ELSE raw END + 0.5) AS BIGINT) AS est_q,
       (SELECT CAST(count(DISTINCT w) AS BIGINT) FROM tokn) AS exact
FROM est
"""


@gate("hll_distinct_terms", _hll_sql())
def hll_distinct_terms(spark, sf_dir):
    """HLL(p=9) distinct-term estimate beside the true count."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.sketches import hll_estimate, hll_registers
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    values = docs.select(F.explode(toks).alias("w"))
    est = hll_estimate(hll_registers(values, "w", p=_HLL_P), p=_HLL_P)
    exact = values.agg(F.countDistinct("w").cast("long").alias("exact"))
    return est.crossJoin(exact)


# ----------------------------------------------------------------------
# weighted_sample — Efraimidis & Spirakis IPL'06 one-pass weighted
# sampling without replacement; u from md5(doc_id), keys compared in
# log space, quantized 1e9.
# ----------------------------------------------------------------------
_WS_K = 20

_WS_SQL = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(floor(
           ln((({_hex_int_sql('CAST(doc_id AS VARCHAR)', 1)}) + 1.0)
              / {float(2**32) + 1.0!r})
           / CAST(n_chars AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT) AS key_q9
  FROM documents WHERE n_chars > 0
)
SELECT CAST(row_number() OVER (ORDER BY key_q9 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, weight, key_q9
FROM keyed QUALIFY rank <= {_WS_K}
"""


@gate("weighted_sample", _WS_SQL)
def weighted_sample(spark, sf_dir):
    """Top-20 weighted sample (weight = n_chars), deterministic keys."""
    from lucenenet_spark.functions.sketches import weighted_sample as _ws
    from lucenenet_spark.plans.gate import _docs_table

    return _ws(_docs_table(spark, sf_dir), weight_col="n_chars", k=_WS_K)


# ----------------------------------------------------------------------
# boilerplate_shingles — Gibson/Punera/Tomkins WWW'05 template
# detection: shingles recurring across a host's documents, integer
# fraction threshold, no float comparisons.
# ----------------------------------------------------------------------
_BP_MIN_DOCS = 3
_BP_FRAC_PPM = 100_000  # 0.1
_BP_TOP = 20

_BP_SQL = f"""
WITH nodes AS (
  SELECT doc_id, source AS host,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
ds AS (
  SELECT DISTINCT host, doc_id, array_to_string(toks[u.j:u.j + 2], ' ') AS shingle
  FROM nodes, unnest(generate_series(1, greatest(length(toks) - 2, 0))) AS u(j)
),
hd AS (SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS host_docs
       FROM nodes GROUP BY host),
cnt AS (
  SELECT host, shingle, CAST(count(*) AS BIGINT) AS n_docs
  FROM ds GROUP BY host, shingle
)
SELECT c.host, c.shingle, c.n_docs, h.host_docs
FROM cnt c JOIN hd h USING (host)
WHERE c.n_docs >= {_BP_MIN_DOCS}
  AND c.n_docs * 1000000 >= {_BP_FRAC_PPM} * h.host_docs
ORDER BY c.n_docs DESC, c.host ASC, c.shingle ASC LIMIT {_BP_TOP}
"""


@gate("boilerplate_shingles", _BP_SQL)
def boilerplate_shingles(spark, sf_dir):
    """Per-host recurring-shingle (template) candidates."""
    from lucenenet_spark.functions.crawl import boilerplate_shingles as _bp
    from lucenenet_spark.plans.gate import _docs_table

    return _bp(
        _docs_table(spark, sf_dir),
        min_docs=_BP_MIN_DOCS,
        min_frac=_BP_FRAC_PPM / 1_000_000,
        top=_BP_TOP,
    )
