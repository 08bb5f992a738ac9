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
        # NULL in the default (columnar/JVM) pack mode: nothing on the
        # query path reads the varint bytes (block_searcher consumes the
        # int arrays), so writing them is pure publish-path cost. The
        # mode="parity" pack fills them (wire-format parity artifact,
        # roundtrip-tested).
        T.StructField("packed", T.BinaryType(), True),
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
                     norm_cache: np.ndarray | None = None,
                     emit_packed: bool = True) -> None:
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
        pos_lists = all_pos[j : j + BLOCK_SIZE] if has_pos else None
        parts = None
        if emit_packed:
            doc_deltas = np.diff(docs, prepend=base)
            parts = [
                varint_encode(np.array([len(docs)], dtype=np.uint64)),
                varint_encode(doc_deltas.astype(np.uint64)),
                varint_encode(tfs.astype(np.uint64)),
                varint_encode(norm.astype(np.uint64)),
            ]
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
        rows["packed"].append(b"".join(parts) if parts is not None else None)


def pack_postings(
    postings: DataFrame, with_positions: bool = True, num_partitions: int | None = None,
    norm_cache: np.ndarray | None = None, mode: str = "columnar_py",
) -> DataFrame:
    """postings rows -> 128-doc blocks (one bounded-size group each).

    All modes agree block-for-block on metadata and columnar arrays
    (tested); `packed` (the varint wire bytes) is NULL except in parity
    mode — nothing on the query path reads it
    (block_searcher._explode_cols consumes the int arrays), and parquet's
    bit-pack/RLE encodings already play ForUtil's compression role.

    mode="columnar_py" (DEFAULT): partition-level mapInPandas numpy pack
    without the varint stream. Measured fastest (1M docs, same-session
    local[32]: python+varint 158 s vs JVM collect_list 299 s; dropping
    varint only removes work) — the numpy kernels beat the boxed
    collect_list aggregate ~2x per core. Parallelism is capped by this
    host's Python-worker ceiling; a real multi-executor cluster runs a
    few workers per executor and has no such cap.

    mode="columnar": the same blocks as pure JVM Column expressions — ONE
    shuffle (groupBy field/term/range, bounded groups), then sort_array +
    slice-chunking + impact extraction inside whole-stage codegen. Zero
    Python in the publish path: use it where Python workers are
    undesirable; ~2x slower per core than the numpy pack here. (The
    round-3 "780 s pack" was mostly a measurement artifact: the probe
    corpus was ONE parquet row group, so the whole pipeline ran in a
    single task; plus the object-agg sort fallback, both fixed.)

    mode="parity": the same mapInPandas pack ALSO emitting the delta+varint
    `packed` stream — the .doc/.pos wire-format parity artifact
    (unpack_blocks roundtrip-tested). Use it only when the byte stream
    itself is wanted."""
    if mode not in ("columnar_py", "columnar", "parity"):
        raise ValueError(
            f"pack_postings mode must be one of 'columnar_py', 'columnar', "
            f"'parity'; got {mode!r}"
        )
    if mode == "columnar":
        return _pack_postings_jvm(postings, with_positions, norm_cache, num_partitions)
    cols = ["field", "term", "doc_id", "tf", "norm_byte"] + (
        ["positions"] if with_positions else []
    )
    df = postings.select(*cols).withColumn(
        "range_id", (F.col("doc_id") / F.lit(RANGE_DOCS)).cast("long")
    )
    # scale-adaptive width: follows the DATA (never fewer partitions than
    # the input has — at cluster scale the input partition count is the
    # size signal), with a modest cores-based floor.  Measured locally the
    # pack is data-bound, not core-bound: 8/16/32-way on a 32-core host
    # packs 108k postings in 0.42/0.43/0.64 s and 1.1M in 1.01/0.90/0.85 s,
    # so the cores term stays capped at 16 (the old hard min(16, cores)
    # additionally throttled big inputs on wide clusters; the in_parts
    # term removes that).
    n = num_partitions or max(
        1,
        min(16, postings.sparkSession.sparkContext.defaultParallelism),
        postings.rdd.getNumPartitions(),
    )
    # sortWithinPartitions makes each group contiguous, so a group can only
    # straddle an Arrow-batch boundary as (last of batch k, first of k+1) —
    # the carry-over below re-joins it without materializing the partition
    df = df.repartition(n, "field", "term", "range_id").sortWithinPartitions(
        "field", "term", "range_id", "doc_id"
    )
    if mode == "columnar_py":
        # whole-batch vectorized Arrow pack: the per-group pandas loop was
        # ~0.1 ms x #(field, term, range) groups of pure Python/numpy call
        # overhead — the dominant pack cost once groups are small
        return df.mapInArrow(
            _pack_partition_arrow(norm_cache, with_positions), BLOCKS_SCHEMA
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
                    _pack_group_into(rows, g, norm_cache, emit_packed=True)
                yield pd.DataFrame(rows)
        if carry is not None and len(carry):
            rows = _new_rows()
            _pack_group_into(rows, carry, norm_cache, emit_packed=True)
            yield pd.DataFrame(rows)

    return df.mapInPandas(pack_partition, BLOCKS_SCHEMA)


def _pack_partition_arrow(norm_cache: np.ndarray | None, with_positions: bool):
    """mapInArrow kernel: one partition's sorted postings -> block rows,
    with every step vectorized over the WHOLE batch (no per-group loop).

    Input batches arrive sorted by (field, term, range_id, doc_id) with a
    group possibly straddling a batch boundary (re-joined via carry).
    Block-for-block identical to the pandas/group path: same block ids,
    same columnar arrays, same impact pair selection (counts per distinct
    (tf, norm_byte) pair computed exactly; pairs ordered by the identical
    float64 proxy utf/(utf + cache[unb]) with ties keeping ascending
    (tf, nb) key order — np.unique ascending + stable sort, reproduced
    here by a segmented lexsort)."""
    import pyarrow as pa

    out_fields = [
        pa.field("field", pa.string()),
        pa.field("term", pa.string()),
        pa.field("block_id", pa.int64()),
        pa.field("n_docs", pa.int32()),
        pa.field("min_doc", pa.int64()),
        pa.field("max_doc", pa.int64()),
        pa.field("max_tf", pa.int32()),
        pa.field("max_norm_byte", pa.int32()),
        pa.field("imp_tf", pa.list_(pa.int32())),
        pa.field("imp_nb", pa.list_(pa.int32())),
        pa.field("imp_cnt", pa.list_(pa.int32())),
        pa.field("doc_offs", pa.list_(pa.int32())),
        pa.field("tfs", pa.list_(pa.int32())),
        pa.field("nbs", pa.list_(pa.int32())),
        pa.field("poss", pa.list_(pa.list_(pa.int32()))),
        pa.field("packed", pa.binary()),
    ]
    out_schema = pa.schema(out_fields)

    def _arr(tbl: "pa.Table", name: str) -> "pa.Array":
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            if col.num_chunks == 1:
                return col.chunk(0)
            if col.num_chunks == 0:
                return pa.array([], type=col.type)
            return pa.concat_arrays(col.chunks)
        return col

    def _group_codes(tbl: "pa.Table") -> np.ndarray:
        """int codes whose adjacent-change boundaries = (field, term,
        range_id) group boundaries (input is group-sorted, so only
        ADJACENT equality matters — dictionary codes give it O(n))."""
        import pyarrow.compute as pc

        f = pc.dictionary_encode(_arr(tbl, "field")).indices.to_numpy(
            zero_copy_only=False
        )
        t = pc.dictionary_encode(_arr(tbl, "term")).indices.to_numpy(
            zero_copy_only=False
        )
        r = tbl.column("range_id").to_numpy(zero_copy_only=False)
        change = np.zeros(len(f), dtype=bool)
        if len(f):
            change[0] = True
            change[1:] = (np.diff(f) != 0) | (np.diff(t) != 0) | (np.diff(r) != 0)
        return np.cumsum(change) - 1

    def _emit(tbl: "pa.Table") -> "pa.RecordBatch":
        import pyarrow.compute as pc

        tbl = tbl.combine_chunks()
        n = tbl.num_rows
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = tbl.column("norm_byte").to_numpy(zero_copy_only=False).astype(np.int64)
        rng = tbl.column("range_id").to_numpy(zero_copy_only=False).astype(np.int64)
        gidx = _group_codes(tbl)
        # defensive: re-sort by doc within groups if a producer skipped the
        # sortWithinPartitions (matches _pack_group_into's fallback)
        if n > 1 and np.any((np.diff(doc) < 0) & (np.diff(gidx) == 0)):
            order = np.lexsort((doc, gidx))
            tbl = tbl.take(pa.array(order, type=pa.int64())).combine_chunks()
            doc, tf, nb, rng = doc[order], tf[order], nb[order], rng[order]
        gstarts = np.r_[0, np.flatnonzero(np.diff(gidx)) + 1]
        glens = np.diff(np.r_[gstarts, n])
        pos_in_group = np.arange(n, dtype=np.int64) - np.repeat(gstarts, glens)
        bmask = (pos_in_group % BLOCK_SIZE) == 0
        bstarts = np.flatnonzero(bmask)
        bends = np.r_[bstarts[1:], n]
        blens = bends - bstarts
        nblk = len(bstarts)

        min_doc = doc[bstarts]
        max_doc = doc[bends - 1]
        max_tf = np.maximum.reduceat(tf, bstarts)
        max_nb = np.maximum.reduceat(nb, bstarts)
        block_id = rng[bstarts] * BLOCKS_PER_RANGE + pos_in_group[bstarts] // BLOCK_SIZE

        # ---- impacts: distinct (tf, nb) pairs + counts per block ----
        bidx = np.repeat(np.arange(nblk, dtype=np.int64), blens)
        key = tf * np.int64(512) + nb
        order = np.lexsort((key, bidx))
        kb, ks = bidx[order], key[order]
        pstart = np.r_[0, np.flatnonzero((np.diff(kb) != 0) | (np.diff(ks) != 0)) + 1]
        pcnt = np.diff(np.r_[pstart, n])
        pblk = kb[pstart]
        pkey = ks[pstart]
        utf = pkey // 512
        unb = pkey % 512
        c = norm_cache[unb] if norm_cache is not None else (256.0 - unb)
        proxy = utf / (utf + c)
        # per-block: proxy desc, ties keep ascending-key order (stable)
        sel = np.lexsort((np.arange(len(pblk)), -proxy, pblk))
        sblk = pblk[sel]
        sstarts = np.r_[0, np.flatnonzero(np.diff(sblk)) + 1]
        slens = np.diff(np.r_[sstarts, len(sblk)])
        rank = np.arange(len(sblk), dtype=np.int64) - np.repeat(sstarts, slens)
        keep = rank < IMPACT_CAP
        ksel = sel[keep]
        imp_lens = np.minimum(slens, IMPACT_CAP)
        # blocks are never empty, so every block has >= 1 pair: sstarts
        # aligns 1:1 with block order
        imp_offs = np.r_[0, np.cumsum(imp_lens)].astype(np.int32)
        imp_tf = pa.ListArray.from_arrays(
            pa.array(imp_offs), pa.array(utf[ksel].astype(np.int32))
        )
        imp_nb = pa.ListArray.from_arrays(
            pa.array(imp_offs), pa.array(unb[ksel].astype(np.int32))
        )
        imp_cnt = pa.ListArray.from_arrays(
            pa.array(imp_offs), pa.array(pcnt[ksel].astype(np.int32))
        )

        # ---- columnar in-block arrays: re-slice, no copies of values ----
        loffs = pa.array(np.r_[bstarts, n].astype(np.int32))
        doc_offs = pa.ListArray.from_arrays(
            loffs, pa.array((doc - np.repeat(min_doc, blens)).astype(np.int32))
        )
        tfs_arr = pa.ListArray.from_arrays(loffs, pa.array(tf.astype(np.int32)))
        nbs_arr = pa.ListArray.from_arrays(loffs, pa.array(nb.astype(np.int32)))
        if with_positions:
            pos_col = _arr(tbl, "positions")
            if pos_col.type != pa.list_(pa.int32()):
                pos_col = pos_col.cast(pa.list_(pa.int32()))
            poss = pa.ListArray.from_arrays(loffs, pos_col)
        else:
            poss = pa.nulls(nblk, type=pa.list_(pa.list_(pa.int32())))

        take_idx = pa.array(bstarts, type=pa.int64())
        cols = [
            pc.take(_arr(tbl, "field"), take_idx),
            pc.take(_arr(tbl, "term"), take_idx),
            pa.array(block_id, type=pa.int64()),
            pa.array(blens.astype(np.int32)),
            pa.array(min_doc, type=pa.int64()),
            pa.array(max_doc, type=pa.int64()),
            pa.array(max_tf.astype(np.int32)),
            pa.array(max_nb.astype(np.int32)),
            imp_tf,
            imp_nb,
            imp_cnt,
            doc_offs,
            tfs_arr,
            nbs_arr,
            poss,
            pa.nulls(nblk, type=pa.binary()),
        ]
        return pa.RecordBatch.from_arrays(cols, schema=out_schema)

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa

        carry: "pa.Table | None" = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None and carry.num_rows:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            carry = None
            if not tbl.num_rows:
                continue
            gidx = _group_codes(tbl)
            last_start = int(np.flatnonzero(np.r_[True, np.diff(gidx) != 0])[-1])
            carry = tbl.slice(last_start)
            body = tbl.slice(0, last_start)
            if body.num_rows:
                yield _emit(body)
        if carry is not None and carry.num_rows:
            yield _emit(carry)

    return run


def _pack_postings_jvm(
    postings: DataFrame, with_positions: bool, norm_cache: np.ndarray | None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Columnar block pack as pure Column expressions (see pack_postings).

    Per (field, term, range) group: sort_array(collect_list(struct)) gives
    the doc-ordered run (struct comparison sorts by its first field,
    doc_id); slice() chunks it into <=128-posting blocks; impact pairs are
    array_distinct + per-pair filter counts + comparator array_sort — all
    inside codegen. Impact SELECTION may break proxy ties differently from
    the numpy pack, which only affects theta quality, never safety (pair
    counts stay exact).

    collect_list runs as ObjectHashAggregate, whose sort-based fallback
    triggers after only 128 distinct keys by default — at 1M docs that
    turned every partition into a giant TimSort (one straggler task
    burned 14 minutes). The (field, term, range) key space is bounded
    (~#terms x ranges-per-term) and each group's buffer is <= RANGE_DOCS
    postings, so the hash aggregate is safe: raise the fallback threshold
    SCOPED to the pack job (set -> materialize -> restore in a finally),
    so later unrelated ObjectHashAggregates in the session keep their
    sort-based OOM fallback (partial data per task ~ its shuffle split,
    held as JVM objects — size executors accordingly at scale). The
    returned frame is therefore PERSISTED (already materialized); callers
    own the unpersist."""
    spark = postings.sparkSession
    # The hash aggregate holds each reduce partition's postings as boxed
    # JVM objects until its groups emit, so per-task memory ~ partition
    # rows x boxed-struct overhead. At 1M docs, 32 partitions put ~2M rows
    # per task and 32 concurrent tasks GC-collapsed the executor (hours,
    # one-core thrash); the (field, term, range) keys are hash-balanced
    # (measured max/min 1.27), so the fix is WIDTH, not salting: shuffle
    # the pack over enough partitions that one task buffers ~250k
    # postings. An explicit repartition on the group keys satisfies the
    # aggregate's required distribution, so no second shuffle is added.
    if num_partitions:
        npart = num_partitions
    else:
        # width heuristic: enough partitions that one task buffers ~250k
        # postings (using input partitioning as the size proxy), but never
        # fewer than the core count and never pointless tiny-task fan-out
        # on small inputs
        par = spark.sparkContext.defaultParallelism
        in_parts = postings.rdd.getNumPartitions()
        npart = max(par, min(8 * par, 4 * in_parts))
    if norm_cache is not None:
        cache_vals = [float(x) for x in np.asarray(norm_cache, dtype=np.float64)]
    else:
        # monotone proxy used by _impacts when no cache is given
        cache_vals = [float(256 - i) for i in range(256)]
    cache_arr = F.array(*[F.lit(v) for v in cache_vals])

    struct_fields = [F.col("doc_id"), F.col("tf"), F.col("norm_byte")] + (
        [F.col("positions")] if with_positions else []
    )
    g = (
        postings.select(
            "field", "term",
            (F.col("doc_id") / F.lit(RANGE_DOCS)).cast("long").alias("range_id"),
            *struct_fields,
        )
        .repartition(npart, "field", "term", "range_id")
        .groupBy("field", "term", "range_id")
        .agg(F.sort_array(F.collect_list(F.struct(*struct_fields))).alias("run"))
    )
    n_chunks = F.ceil(F.size("run") / F.lit(BLOCK_SIZE)).cast("int")
    chunked = g.select(
        "field", "term", "range_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - F.lit(1)),
                lambda i: F.slice("run", i * BLOCK_SIZE + 1, BLOCK_SIZE),
            )
        ).alias("chunk", "ps"),
    )

    ps = F.col("ps")
    base = F.element_at(ps, 1)["doc_id"]
    tfs = F.transform(ps, lambda x: x["tf"].cast("int"))
    nbs = F.transform(ps, lambda x: x["norm_byte"].cast("int"))
    pairs = F.array_distinct(
        F.transform(
            ps,
            lambda x: F.struct(
                x["tf"].cast("int").alias("tf"),
                x["norm_byte"].cast("int").alias("nb"),
            ),
        )
    )
    scored_pairs = F.transform(
        pairs,
        lambda p: F.struct(
            p["tf"].alias("tf"),
            p["nb"].alias("nb"),
            F.size(
                F.filter(
                    ps,
                    lambda x: (x["tf"] == p["tf"]) & (x["norm_byte"] == p["nb"]),
                )
            ).cast("int").alias("cnt"),
            (
                p["tf"].cast("double")
                / (p["tf"].cast("double") + F.element_at(cache_arr, p["nb"] + 1))
            ).alias("proxy"),
        ),
    )
    imp = F.slice(
        F.array_sort(
            scored_pairs,
            lambda l, r: F.when(l["proxy"] > r["proxy"], -1)
            .when(l["proxy"] < r["proxy"], 1)
            .when(l["tf"] < r["tf"], -1)
            .when(l["tf"] > r["tf"], 1)
            .otherwise(0)
            .cast("int"),
        ),
        1,
        IMPACT_CAP,
    )

    out = chunked.select(
        "field",
        "term",
        (F.col("range_id") * F.lit(BLOCKS_PER_RANGE) + F.col("chunk"))
        .cast("long")
        .alias("block_id"),
        F.size(ps).cast("int").alias("n_docs"),
        base.cast("long").alias("min_doc"),
        F.element_at(ps, -1)["doc_id"].cast("long").alias("max_doc"),
        F.array_max(tfs).cast("int").alias("max_tf"),
        F.array_max(nbs).cast("int").alias("max_norm_byte"),
        F.transform(imp, lambda x: x["tf"]).alias("imp_tf"),
        F.transform(imp, lambda x: x["nb"]).alias("imp_nb"),
        F.transform(imp, lambda x: x["cnt"]).alias("imp_cnt"),
        F.transform(ps, lambda x: (x["doc_id"] - base).cast("int")).alias("doc_offs"),
        tfs.alias("tfs"),
        nbs.alias("nbs"),
        (
            F.transform(ps, lambda x: x["positions"])
            if with_positions
            else F.lit(None).cast("array<array<int>>")
        ).alias("poss"),
        F.lit(None).cast("binary").alias("packed"),
    )

    # Scoped conf: the SQL conf is read at execution time, so the raised
    # threshold must be live while the pack job RUNS. Materialize the
    # (persisted) result under the raised value, then restore the prior
    # session value whatever happens.
    key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    try:
        prior = spark.conf.get(key)
    except Exception:
        prior = None
    spark.conf.set(key, "33554432")
    try:
        out = out.persist()
        out.count()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return out


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
