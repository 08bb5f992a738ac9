"""Gate registry round-5 part zzzb: content-defined chunking (CDC) for
storage-level dedup, and Misra-Gries-certified exact heavy hitters.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, get_engine

_W, _DIV, _MIN, _MAX = 8, 32, 16, 128


def _hex8(arg: str) -> str:
    """First 8 hex chars of md5(arg) as a big-endian 32-bit integer (the
    gate_pipeline._hex8_sql pattern, generalized to any expression)."""
    dig = "(strpos('0123456789abcdef', substr(md5(" + arg + "), {p}, 1)) - 1)"
    return " + ".join(f"({dig.format(p=j + 1)}) * {16 ** (7 - j)}" for j in range(8))


# ----------------------------------------------------------------------
# cdc_chunks — SOSP'01 content-defined chunk boundaries; oracle replays
# the sequential min/max cut fold as a recursive CTE over the candidate
# boundary set.
# ----------------------------------------------------------------------
_CDC_SQL = f"""
WITH RECURSIVE d2 AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
),
cand AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(8, CAST(length(text) AS INTEGER))) AS i
    FROM d2
  )
  WHERE ({_hex8(f"substr(text, i - {_W - 1}, {_W})")}) % {_DIV} = 0
),
rec AS (
  SELECT doc_id, n, CAST(0 AS BIGINT) AS cut, CAST(0 AS BIGINT) AS idx
  FROM d2 WHERE n > 0
  UNION ALL
  SELECT r.doc_id, r.n,
    CASE WHEN least(
           coalesce((SELECT min(c.i) FROM cand c
                     WHERE c.doc_id = r.doc_id AND c.i >= r.cut + {_MIN}),
                    4611686018427387904),
           r.cut + {_MAX}) <= r.n
      THEN least(
           coalesce((SELECT min(c.i) FROM cand c
                     WHERE c.doc_id = r.doc_id AND c.i >= r.cut + {_MIN}),
                    4611686018427387904),
           r.cut + {_MAX})
      ELSE r.n END,
    r.idx + 1
  FROM rec r WHERE r.cut < r.n
),
chunks AS (
  SELECT a.doc_id, a.idx - 1 AS chunk_idx, b.cut + 1 AS start,
         a.cut - b.cut AS chunk_len
  FROM rec a JOIN rec b ON a.doc_id = b.doc_id AND b.idx = a.idx - 1
  WHERE a.idx >= 1
)
SELECT c.doc_id, c.chunk_idx, c.start, c.chunk_len,
       CAST({_hex8("substr(d.text, CAST(c.start AS INTEGER), CAST(c.chunk_len AS INTEGER))")} AS BIGINT) AS sig
FROM chunks c JOIN d2 d USING (doc_id)
ORDER BY doc_id, chunk_idx
"""


@gate("cdc_chunks", _CDC_SQL)
def cdc_chunks_gate(spark, sf_dir):
    """Content-defined chunk table (doc_id, chunk_idx, start, len, sig)."""
    from lucenenet_spark.functions.cdc import cdc_chunks

    _, _, docs = get_engine(spark, sf_dir)
    return cdc_chunks(
        docs, window=_W, divisor=_DIV, min_len=_MIN, max_len=_MAX
    ).orderBy("doc_id", "chunk_idx")


# ----------------------------------------------------------------------
# heavy_hitters_certified — two-pass Misra-Gries + exact recount over
# the events.event_type stream (k=4 counters over 5 values: eviction-
# heavy, and the N/5 threshold lands INSIDE the count distribution).
# Oracle is the independent plain GROUP BY ... HAVING.
# ----------------------------------------------------------------------
_HH_K = 4

_HH_SQL = f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM events)
SELECT event_type AS term, CAST(count(*) AS BIGINT) AS true_count, n.nt AS n_total
FROM events, n GROUP BY event_type, n.nt
HAVING count(*) * {_HH_K + 1} > n.nt
ORDER BY term
"""


@gate("heavy_hitters_certified", _HH_SQL)
def heavy_hitters_certified(spark, sf_dir):
    """Exact phi=1/(k+1) heavy hitters, MG-candidates then recount."""
    import os

    from pyspark.sql import functions as F

    from lucenenet_spark.functions.sketches import certified_heavy_hitters

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    tokens = ev.select(
        F.col("event_id").alias("doc_id"),
        F.lit(0).alias("pos"),
        F.col("event_type").alias("term"),
    )
    return certified_heavy_hitters(tokens, k=_HH_K, n_partitions=4).orderBy("term")
