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


def elias_fano_audit(
    idx, top_terms: int = 10, field: str | None = None
):
    """Quasi-succinct (Elias-Fano) posting-list size audit — Vigna,
    "Quasi-Succinct Indices", WSDM 2013 (the encoding behind modern
    freshness-critical posting formats), against the delta-bit cost the
    engine's layout actually produces (docid_gap_stats' measure).

    For a term with df = n monotone doc ids in universe U = max_doc:

        l        = max(0, floor(log2(U / n)))   lower-bit width
        ef_bits  = n·l + n + ceil(U / 2^l)      lower arrays + upper unary

    computed with INTEGER arithmetic only: floor(log2(U/n)) =
    bit_length(U div n) - 1 (valid since n <= U), 2^l via shiftleft,
    ceilings via (a + b - 1) div b — no pow/log doubles (the 1-ulp trap
    the determinism notes flag).  gap_bits = Σ bit_length(gap) over the
    doc-id deltas (first gap = doc_id + 1) is the corresponding
    information-content measure of the engine's URL-sorted layout.

    Output: (term, df, ef_bits, gap_bits) for the ``top_terms`` highest
    df terms (df DESC, term ASC) — the lists where encoding choice
    moves real bytes at 10^12 docs.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fld = field or idx.default_field
    u = int(idx.max_doc)
    stats = idx.term_stats.filter(F.col("field") == fld).select("term", "df")
    w = Window.orderBy(F.desc("df"), F.asc("term"))
    top = stats.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= top_terms
    ).select("term", F.col("df").cast("long").alias("df"))
    # l = bit_length(U div n) - 1 ; bit_length(x) = length(bin(x));
    # all divisions are integer `div` (no double rounding anywhere)
    l_col = (
        F.length(F.conv(F.expr(f"{u} div df").cast("string"), 10, 2)) - F.lit(1)
    ).cast("long")
    l_col = F.greatest(l_col, F.lit(0))
    ef = top.withColumn("l", l_col).withColumn(
        "ef_bits",
        (
            F.col("df") * F.col("l")
            + F.col("df")
            + F.expr(f"({u} + shiftleft(CAST(1 AS BIGINT), CAST(l AS INT)) - 1)"
                     " div shiftleft(CAST(1 AS BIGINT), CAST(l AS INT))")
        ).cast("long"),
    )
    p = idx.postings.filter(F.col("field") == fld).join(
        F.broadcast(top.select("term")), "term"
    )
    gw = Window.partitionBy("term").orderBy(F.asc("doc_id"))
    gaps = p.select("term", "doc_id").withColumn(
        "gap",
        F.col("doc_id")
        - F.coalesce(F.lag("doc_id").over(gw), F.lit(-1)),
    )
    gbits = gaps.select(
        "term",
        F.length(F.conv(F.col("gap").cast("string"), 10, 2)).cast("long").alias("b"),
    ).groupBy("term").agg(F.sum("b").cast("long").alias("gap_bits"))
    return ef.join(gbits, "term").select("term", "df", "ef_bits", "gap_bits")


def impact_quantization_audit(
    idx, term: str, levels: int = 8, field: str | None = None
):
    """Stored-impact quantization audit (Anh & Moffat, "Simplified
    Similarity Scoring Using Term Ranks"/"Pruned Query Evaluation Using
    Pre-Computed Impacts", SIGIR 2005/2006): their index stores each
    posting's contribution as a SMALL integer impact level (3 bits
    here) instead of tf+norm — this op measures what that lossy storage
    does to one term's ranking.

    level = floor((impact - min) · L / (max - min + 1)) over the term's
    exact quantized BM25 impacts — equi-width, all-integer.  The audit
    compares the level-ordering (level DESC, doc ASC) with the exact
    ordering (impact DESC, doc ASC) by Kendall tau-a over all matching
    docs: C/D are exact pair counts, tau quantized q6.

    The pair count is O(df^2) — an AUDIT over one term, not a serving
    path; at web scale you run it on a sampled posting subset.

    Output one row: (n, levels, distinct_levels, concordant,
    discordant, tau_q6).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.search.sharded import posting_impact_q

    if levels < 2:
        raise ValueError(f"levels must be >= 2, got {levels}")
    fld = field or idx.default_field
    avgdl = idx.avgdl_double_for(fld)
    stats = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    p = idx.postings.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).crossJoin(F.broadcast(stats))
    imp = p.select(
        "doc_id",
        posting_impact_q(
            F.col("df"), F.col("tf"), F.col("dl"), idx.max_doc, avgdl
        ).alias("imp"),
    )
    rng = imp.agg(
        F.min("imp").alias("lo"), F.max("imp").alias("hi")
    )
    lv = imp.crossJoin(F.broadcast(rng)).select(
        "doc_id",
        "imp",
        F.floor(
            (F.col("imp") - F.col("lo")) * F.lit(levels)
            / (F.col("hi") - F.col("lo") + F.lit(1))
        )
        .cast("long")
        .alias("lvl"),
    )
    a = lv.select(
        F.col("doc_id").alias("da"), F.col("imp").alias("ia"), F.col("lvl").alias("la")
    )
    b = lv.select(
        F.col("doc_id").alias("db"), F.col("imp").alias("ib"), F.col("lvl").alias("lb")
    )
    pairs = a.join(b, F.col("da") < F.col("db"))
    # exact order: (imp DESC, doc ASC); level order: (lvl DESC, doc ASC)
    exact_ab = (F.col("ia") > F.col("ib")) | (
        (F.col("ia") == F.col("ib")) & (F.col("da") < F.col("db"))
    )
    lvl_ab = (F.col("la") > F.col("lb")) | (
        (F.col("la") == F.col("lb")) & (F.col("da") < F.col("db"))
    )
    agg = pairs.agg(
        F.sum(F.when(exact_ab == lvl_ab, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(exact_ab != lvl_ab, 1).otherwise(0)).cast("long").alias("discordant"),
    )
    n = lv.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("lvl").cast("long").alias("distinct_levels"),
    )
    return n.crossJoin(agg).select(
        "n",
        F.lit(levels).cast("long").alias("levels"),
        "distinct_levels",
        "concordant",
        "discordant",
        F.floor(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / ((F.col("n") * (F.col("n") - 1)).cast("double") / F.lit(2.0))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tau_q6"),
    )


def pfordelta_size_audit(
    idx, top_terms: int = 3, block: int = 128, pct_num: int = 9,
    pct_den: int = 10, exception_bits: int = 32, field: str | None = None
):
    """PForDelta posting-block size audit (Zukowski, Héman, Nes &
    Boncz, "Super-Scalar RAM-CPU Cache Compression", ICDE 2006; the
    web-search tuning of Zhang, Long & Suel, WWW 2008): each 128-gap
    block encodes at the bit width b that fits the 90th-percentile gap;
    larger gaps become exceptions at full width.

        block bits = n_b · b + exceptions · 32

    b is the bit_length of the ceil(0.9·n_b)-th SMALLEST gap in the
    block — an integer order statistic (one window per block), no
    doubles anywhere; bit_length via the bin-string-length idiom.
    The audit complements elias_fano_audit (global closed form) and
    docid_gap_stats (information content) with the format real engines
    shipped.

    Output per term (the ``top_terms`` highest-df lists):
    (term, df, n_blocks, total_bits, exceptions).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if block < 1 or not (0 < pct_num < pct_den):
        raise ValueError("need block >= 1 and 0 < pct_num < pct_den")
    fld = field or idx.default_field
    stats = idx.term_stats.filter(F.col("field") == fld).select("term", "df")
    tw = Window.orderBy(F.desc("df"), F.asc("term"))
    top = stats.withColumn("_r", F.row_number().over(tw)).filter(
        F.col("_r") <= top_terms
    ).select("term", F.col("df").cast("long").alias("df"))
    p = idx.postings.filter(F.col("field") == fld).join(
        F.broadcast(top.select("term")), "term"
    )
    ow = Window.partitionBy("term").orderBy(F.asc("doc_id"))
    gaps = (
        p.select("term", "doc_id")
        .withColumn("gap", F.col("doc_id") - F.coalesce(F.lag("doc_id").over(ow), F.lit(-1)))
        .withColumn("rn", F.row_number().over(ow).cast("long"))
        .withColumn("blk", F.floor((F.col("rn") - 1) / F.lit(block)).cast("long"))
        .withColumn(
            "gbits",
            F.length(F.conv(F.col("gap").cast("string"), 10, 2)).cast("long"),
        )
    )
    bw = Window.partitionBy("term", "blk").orderBy(F.asc("gap"), F.asc("doc_id"))
    sized = gaps.withColumn("grank", F.row_number().over(bw).cast("long"))
    per_blk_n = gaps.groupBy("term", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("n_b")
    )
    # b = gbits of the ceil(pct * n_b)-th smallest gap
    bsel = (
        sized.join(per_blk_n, ["term", "blk"])
        .filter(
            F.col("grank")
            == F.ceil(F.col("n_b") * F.lit(pct_num) / F.lit(pct_den)).cast("long")
        )
        .select("term", "blk", F.col("gbits").alias("b"), "n_b")
    )
    blocks = (
        gaps.join(bsel, ["term", "blk"])
        .groupBy("term", "blk", "b", "n_b")
        .agg(
            F.sum(F.when(F.col("gbits") > F.col("b"), 1).otherwise(0))
            .cast("long")
            .alias("exc")
        )
        .withColumn(
            "bits",
            (F.col("n_b") * F.col("b") + F.col("exc") * F.lit(exception_bits)).cast("long"),
        )
    )
    return (
        blocks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("bits").cast("long").alias("total_bits"),
            F.sum("exc").cast("long").alias("exceptions"),
        )
        .join(top, "term")
        .select("term", "df", "n_blocks", "total_bits", "exceptions")
    )
