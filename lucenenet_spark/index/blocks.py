"""Block-compressed postings + block-max metadata + WAND-style pruning.

Physical layout mirroring the reference's Lucene41 postings format
(src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsFormat.cs, BLOCK_SIZE=128
at :375; ForUtil.cs FOR bitpacking; Lucene41SkipWriter skip data), adapted
to a columnar table:

    blocks(term, block_id, n_docs, min_doc, max_doc, max_tf,
           max_norm_byte, impacts..., columnar arrays..., packed BINARY)

- Blocks are Lucene-style runs of <= 128 CONSECUTIVE postings of one
  term's doc-sorted posting list (utilization ~100% at any df), chunked
  inside a shared RANGE_DOCS doc-id grid: block_id = range_id *
  BLOCKS_PER_RANGE + chunk. The (field, term, range_id) pack key keeps
  the aggregation skew-free no matter how frequent the term is (a
  stopword-scale term with 10^10 postings becomes ~10^6 independent
  range groups — the df-heavy-term mitigation the north rule requires),
  and the shared grid is the WAND cross-term alignment grain.
- packed = varint stream: doc-id deltas within the block, then tfs, then
  per-doc position-delta lists (the reference's .doc/.pos streams inlined;
  delta + variable-byte instead of FOR bitpacking — same asymptotics,
  simpler in numpy; parity of scores, not bytes, is the contract).
- (min_doc, max_doc) per block = the skip list (MultiLevelSkipListWriter):
  doc-range pruning during conjunctions.
- (max_tf, max_norm_byte) per block = block-max metadata — what Lucene 4.8
  LACKS (no max-score metadata; SURVEY.md §4.2) and what BlockMaxWAND
  (Ding & Suel 2011) adds: an upper bound on any BM25 score inside the
  block, enabling safe top-k pruning.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK_SIZE = 128  # Lucene41PostingsFormat.cs:375
IMPACT_CAP = 8  # impact pairs kept per block (score-descending)
# Coarse doc-id alignment span: a block never crosses a range boundary.
# Blocks are Lucene-style runs of <= 128 CONSECUTIVE POSTINGS of one term
# (so utilization ~100% regardless of df — a df=1000 term has ~8 blocks,
# not 1000 near-empty ones), while the shared range grid is what lets
# multi-term WAND compose upper bounds across terms (ub per range = max of
# the term's blocks inside it). RANGE_DOCS also bounds the pack shuffle
# key (field, term, range_id): a stopword-scale term becomes
# N/RANGE_DOCS independent groups — skew-free, like the old design.
RANGE_DOCS = BLOCK_SIZE * 256  # 32,768 docs per range
BLOCKS_PER_RANGE = RANGE_DOCS // BLOCK_SIZE  # block_id = range*256 + chunk


# --------------------------------------------------------------------------
# numpy varint codec (LEB128, unsigned)
# --------------------------------------------------------------------------
def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: ceil(bit_length/7), min 1
    bl = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        bl[mask] += 1
        tmp = tmp >> np.uint64(7)
    bl[bl == 0] = 1
    total = int(bl.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(bl)
    starts = ends - bl
    # fill byte position p of every value that has > p bytes
    max_len = int(bl.max())
    shifted = v.copy()
    for p in range(max_len):
        mask = bl > p
        idx = starts[mask] + p
        chunk = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (bl[mask] > p + 1).astype(np.uint8) << 7  # continuation bit
        out[idx] = chunk | cont
        shifted = shifted >> np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 back to uint64 (vectorized over the whole buffer)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.array([], dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    vals = np.zeros(len(ends), dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for p in range(max_len):
        mask = (starts + p) <= ends
        vals[mask] |= (b[starts[mask] + p] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * p
        )
    if count is not None:
        assert len(vals) == count, (len(vals), count)
    return vals


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("min_doc", T.LongType(), False),
        T.StructField("max_doc", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("max_norm_byte", T.IntegerType(), False),
        # impact list (Lucene 8+ impacts, Codecs/.../ImpactsEnum — the
        # reference's 4.8 codec predates them; Ding & Suel motivate the
        # block-max family): the block's top distinct (tf, norm_byte)
        # pairs WITH exact doc counts, score-descending, capped at
        # IMPACT_CAP. Each pair guarantees "icnt docs in this block score
        # exactly w*tf/(tf+cache[nb])" — the searcher derives a safe
        # k-th-score threshold from metadata alone, zero pre-actions.
        T.StructField("imp_tf", T.ArrayType(T.IntegerType()), False),
        T.StructField("imp_nb", T.ArrayType(T.IntegerType()), False),
        T.StructField("imp_cnt", T.ArrayType(T.IntegerType()), False),
        # columnar in-block postings — the SERVING representation: plain
        # int arrays that Spark explodes/scores inside whole-stage codegen
        # (no Python decode in the query path) and that parquet stores
        # bit-packed/RLE'd — the FOR-compression role ForUtil.cs plays in
        # the reference. `packed` below is the delta+varint stream
        # (.doc/.pos wire format parity artifact); both carry the same
        # postings (roundtrip-tested).
        T.StructField("doc_offs", T.ArrayType(T.IntegerType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
        T.StructField("nbs", T.ArrayType(T.IntegerType()), False),
        T.StructField("poss", T.ArrayType(T.ArrayType(T.IntegerType())), True),
        T.StructField("packed", T.BinaryType(), False),
    ]
)


def _impacts(tfs: np.ndarray, norm: np.ndarray, norm_cache: np.ndarray | None):
    """Top-IMPACT_CAP distinct (tf, norm_byte) pairs with exact counts,
    ordered by descending tf/(tf + c[nb]).  With the real norm cache the
    ordering is the true BM25 score shape; without it a monotone proxy
    (c decreasing in nb, like the cache) is used — pair COUNTS stay exact
    either way, so thresholds derived from kept pairs are always safe,
    only pair *selection* is approximate."""
    key = tfs * np.int64(512) + norm
    uk, cnt = np.unique(key, return_counts=True)
    utf = (uk // 512).astype(np.int64)
    unb = (uk % 512).astype(np.int64)
    c = norm_cache[unb] if norm_cache is not None else (256.0 - unb)
    proxy = utf / (utf + c)
    top = np.argsort(-proxy, kind="stable")[:IMPACT_CAP]
    return utf[top], unb[top], cnt[top]


_ROW_KEYS = (
    "field", "term", "block_id", "n_docs", "min_doc", "max_doc",
    "max_tf", "max_norm_byte", "imp_tf", "imp_nb", "imp_cnt",
    "doc_offs", "tfs", "nbs", "poss", "packed",
)


def _new_rows() -> dict[str, list]:
    return {k: [] for k in _ROW_KEYS}


def _pack_group_into(rows: dict[str, list], pdf: pd.DataFrame,
                     norm_cache: np.ndarray | None = None) -> None:
    """One (field, term, range) group -> one row per <=128-posting chunk,
    APPENDED into the shared per-batch accumulator (a pd.DataFrame per
    group was ~60% of pack wall time at 100k docs).

    block_id = range_id * BLOCKS_PER_RANGE + chunk index, so block ids
    sort by doc order within the term and two blocks of the same range
    grid can be compared across terms. Doc ids are stored as offsets from
    the block's min_doc (columnar) / delta+varint from min_doc (packed).
    Input arrives doc-sorted (pack_postings sortWithinPartitions)."""
    all_docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    if len(all_docs) > 1 and (np.diff(all_docs) < 0).any():
        pdf = pdf.sort_values("doc_id")
        all_docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    all_tfs = pdf["tf"].to_numpy(dtype=np.int64)
    all_norm = pdf["norm_byte"].to_numpy(dtype=np.int64)
    has_pos = "positions" in pdf.columns
    all_pos = pdf["positions"].tolist() if has_pos else None
    range_id = int(all_docs[0]) // RANGE_DOCS
    field = pdf["field"].iloc[0]
    term = pdf["term"].iloc[0]

    for j in range(0, len(all_docs), BLOCK_SIZE):
        docs = all_docs[j : j + BLOCK_SIZE]
        tfs = all_tfs[j : j + BLOCK_SIZE]
        norm = all_norm[j : j + BLOCK_SIZE]
        base = int(docs[0])
        doc_deltas = np.diff(docs, prepend=base)
        parts = [
            varint_encode(np.array([len(docs)], dtype=np.uint64)),
            varint_encode(doc_deltas.astype(np.uint64)),
            varint_encode(tfs.astype(np.uint64)),
            varint_encode(norm.astype(np.uint64)),
        ]
        pos_lists = all_pos[j : j + BLOCK_SIZE] if has_pos else None
        if pos_lists is not None:
            lens = np.array([len(p) for p in pos_lists], dtype=np.uint64)
            parts.append(varint_encode(lens))
            if lens.sum() > 0:
                flat = np.concatenate(
                    [np.asarray(p, dtype=np.int64) for p in pos_lists]
                )
                firsts = np.concatenate(([0], np.cumsum(lens.astype(np.int64))[:-1]))
                deltas = np.diff(flat, prepend=0)
                deltas[firsts] = flat[firsts]
                parts.append(varint_encode(deltas.astype(np.uint64)))
        itf, inb, icnt = _impacts(tfs, norm, norm_cache)
        rows["field"].append(field)
        rows["term"].append(term)
        rows["block_id"].append(range_id * BLOCKS_PER_RANGE + j // BLOCK_SIZE)
        rows["n_docs"].append(len(docs))
        rows["min_doc"].append(base)
        rows["max_doc"].append(int(docs[-1]))
        rows["max_tf"].append(int(tfs.max()))
        rows["max_norm_byte"].append(int(norm.max()))
        rows["imp_tf"].append(itf.astype(np.int32).tolist())
        rows["imp_nb"].append(inb.astype(np.int32).tolist())
        rows["imp_cnt"].append(icnt.astype(np.int32).tolist())
        rows["doc_offs"].append((docs - base).astype(np.int32).tolist())
        rows["tfs"].append(tfs.astype(np.int32).tolist())
        rows["nbs"].append(norm.astype(np.int32).tolist())
        rows["poss"].append(
            [p.tolist() if hasattr(p, "tolist") else list(p) for p in pos_lists]
            if pos_lists is not None
            else None
        )
        rows["packed"].append(b"".join(parts))


def pack_postings(
    postings: DataFrame, with_positions: bool = True, num_partitions: int | None = None,
    norm_cache: np.ndarray | None = None,
) -> DataFrame:
    """postings rows -> 128-doc packed blocks (one bounded-size group each).

    Implementation: ONE shuffle co-locating each (field, term, block) group,
    then a partition-level mapInPandas that packs every group of the
    partition in-process (pandas groupby loop over numpy kernels). A
    per-group applyInPandas would schedule one Python-worker round trip per
    group AND inherit spark.sql.shuffle.partitions as its worker count —
    on this host >16 concurrent Python workers collapse (TODO.md gotcha),
    so the partition count is capped."""
    cols = ["field", "term", "doc_id", "tf", "norm_byte"] + (
        ["positions"] if with_positions else []
    )
    df = postings.select(*cols).withColumn(
        "range_id", (F.col("doc_id") / F.lit(RANGE_DOCS)).cast("long")
    )
    n = num_partitions or min(
        16, max(1, postings.sparkSession.sparkContext.defaultParallelism)
    )
    # sortWithinPartitions makes each group contiguous, so a group can only
    # straddle an Arrow-batch boundary as (last of batch k, first of k+1) —
    # the carry-over below re-joins it without materializing the partition
    df = df.repartition(n, "field", "term", "range_id").sortWithinPartitions(
        "field", "term", "range_id", "doc_id"
    )
    keys = ["field", "term", "range_id"]

    def pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            last = pdf.iloc[-1]
            is_last_group = (
                (pdf["field"] == last["field"])
                & (pdf["term"] == last["term"])
                & (pdf["range_id"] == last["range_id"])
            )
            carry = pdf[is_last_group]
            body = pdf[~is_last_group]
            if len(body):
                rows = _new_rows()
                for _, g in body.groupby(keys, sort=False):
                    _pack_group_into(rows, g, norm_cache)
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            rows = _new_rows()
            _pack_group_into(rows, carry, norm_cache)
            yield pd.DataFrame(rows)

    return df.mapInPandas(pack_partition, BLOCKS_SCHEMA)


UNPACKED_SCHEMA = T.StructType(
    [
        T.StructField("field", T.StringType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("norm_byte", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
    ]
)


def unpack_block_bytes(term: str, min_doc: int, packed: bytes, with_positions: bool = True):
    """Decode one packed block -> (doc_ids, tfs, norm_bytes, positions|None).
    Doc deltas are based at the block's min_doc (first delta is 0)."""
    vals = varint_decode(packed)
    off = 0
    n = int(vals[off]); off += 1
    doc_deltas = vals[off : off + n].astype(np.int64); off += n
    tfs = vals[off : off + n].astype(np.int64); off += n
    norms = vals[off : off + n].astype(np.int64); off += n
    docs = np.cumsum(doc_deltas) + min_doc
    pos_lists = None
    if with_positions and off < len(vals):
        lens = vals[off : off + n].astype(np.int64); off += n
        flat = vals[off:].astype(np.int64)
        # undo per-doc delta: positions within doc d are cumsum of its deltas
        pos_lists = []
        start = 0
        for ln in lens:
            ln = int(ln)
            pos_lists.append(np.cumsum(flat[start : start + ln]).astype(np.int32).tolist())
            start += ln
    return docs, tfs, norms, pos_lists


def unpack_blocks(blocks: DataFrame, with_positions: bool = True) -> DataFrame:
    """blocks -> postings rows (mapInPandas batch decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_fld, out_term, out_doc, out_tf, out_norm, out_pos = [], [], [], [], [], []
            for _, row in pdf.iterrows():
                docs, tfs, norms, pos = unpack_block_bytes(
                    row["term"], int(row["min_doc"]), row["packed"], with_positions
                )
                out_fld.extend([row["field"]] * len(docs))
                out_term.extend([row["term"]] * len(docs))
                out_doc.extend(docs.tolist())
                out_tf.extend(tfs.tolist())
                out_norm.extend(norms.tolist())
                out_pos.extend(pos if pos is not None else [None] * len(docs))
            yield pd.DataFrame(
                {
                    "field": out_fld,
                    "term": out_term,
                    "doc_id": out_doc,
                    "tf": out_tf,
                    "norm_byte": out_norm,
                    "positions": out_pos,
                }
            )

    return blocks.mapInPandas(run, UNPACKED_SCHEMA)
