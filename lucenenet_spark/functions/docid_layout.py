"""Doc-id assignment vs posting compressibility (index-layout analytics).

Why this engine assigns dense doc ids by sorting a stable key (SURVEY §1.1
docID row): postings store doc-id DELTAS (delta+VInt / FOR blocks,
reference src/Lucene.Net/Codecs/Lucene41/Lucene41PostingsWriter.cs), and
the bit cost of a delta is ~log2(gap).  Assigning ids in URL order
clusters same-site documents — which share vocabulary — into adjacent ids,
shrinking the gaps of their shared terms (Silvestri, "Sorting out the
document identifier assignment problem", ECIR 2007).  This module measures
that effect on the engine's own postings: total delta bit cost under the
index's actual id assignment versus a deterministic random permutation of
the same ids.

The statistic is exact integer arithmetic end to end (bit length of a
positive gap = length of its binary-digit string; totals are integer
sums; the mean is a scaled integer division), so it is reproducible
bit-for-bit on any engine — and cheap: one pass over postings, one
window per term, no data movement beyond the per-term sort the postings
already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex


def _gap_bits(posting_ids: DataFrame, ordering: str) -> DataFrame:
    """(ordering, n_gaps, total_bits, milli_bits_per_gap) for one id map.

    posting_ids: (term, id) — one row per posting under some assignment.
    Gap bit cost = floor(log2(gap)) + 1 = length of gap's binary string
    (gaps are >= 1: ids are distinct within a term).
    """
    w = Window.partitionBy("term").orderBy("id")
    gaps = (
        posting_ids.withColumn("prev", F.lag("id").over(w))
        .filter(F.col("prev").isNotNull())
        .select((F.col("id") - F.col("prev")).alias("gap"))
    )
    bits = gaps.select(
        F.length(F.conv(F.col("gap").cast("string"), 10, 2)).cast("long").alias("bits")
    )
    return bits.agg(
        F.lit(ordering).alias("ordering"),
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.floor(F.sum("bits").cast("double") * F.lit(1000.0) / F.count("*"))
        .cast("long")
        .alias("milli_bits_per_gap"),
    )


def docid_gap_stats(idx: InvertedIndex, field: str | None = None) -> DataFrame:
    """Delta bit cost of the index's postings under (a) the engine's
    URL-sorted doc-id assignment and (b) a deterministic md5 scramble of
    the same ids (the "arrival order" counterfactual).  Returns two rows:
    (ordering, n_gaps, total_bits, milli_bits_per_gap); url_order total
    <= scrambled total whenever key-sorted assignment clusters vocabulary.
    """
    fld = field or idx.default_field
    post = idx.postings.filter(F.col("field") == fld).select("term", "doc_id")
    ids = idx.doclens.filter(F.col("field") == fld).select("doc_id").distinct()
    # deterministic permutation: rank of md5(doc_id) — engine-agnostic
    # diagnostic counterfactual: the scramble ranks all ids through one
    # window partition — fine for an audit job, not a serving path
    perm_w = Window.orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    perm = ids.select(
        "doc_id", (F.row_number().over(perm_w) - F.lit(1)).cast("long").alias("scrambled_id")
    )
    url_order = post.select("term", F.col("doc_id").alias("id"))
    scrambled = post.join(perm, "doc_id").select(
        "term", F.col("scrambled_id").alias("id")
    )
    return _gap_bits(url_order, "url_order").unionByName(
        _gap_bits(scrambled, "scrambled")
    )
