"""Sharded serving: distributed top-k merge and static index pruning.

Two operators a multi-node deployment of this engine runs on every query
and every index build:

* ``shard_merge_topk`` — the distributed query fan-out/merge step.
  Reference semantics: ``TopDocs.Merge`` (src/Lucene.Net/Search/TopDocs.cs,
  MergeSortQueue: score DESC, then shardIndex ASC, then local doc ASC) over
  per-shard ``TopScoreDocCollector`` results, with shards as contiguous
  docBase ranges exactly like ``IndexSearcher``'s leaf slices
  (src/Lucene.Net/Search/IndexSearcher.cs:835-838, ReaderUtil.SubIndex:
  global docID = docBase + local docID).  Because shards are contiguous
  ranges, (shardIndex ASC, local doc ASC) == global doc_id ASC, so the
  merged page is provably identical to the single-searcher page — which is
  what makes the fan-out transparent to users.  At 100 TB this is the
  serving plan: each executor computes its own k-row heap over its slice
  (a window per shard, map-side), and only shards×k rows reach the final
  ordered take.

* ``prune_index_topm`` — static impact-based index pruning
  (Carmel et al., "Static Index Pruning for Information Retrieval
  Systems", SIGIR 2001): keep only the top-m highest-impact postings of
  every term, where impact is the SAME BM25 partial the searcher computes
  at query time (idf * (k1+1) * tf / (tf + k1*((1-b) + b*dl/avgdl))).
  Collection statistics (df/ttf/avgdl/maxDoc) are kept GLOBAL — pruning
  changes which postings exist, never how survivors score — so any
  single-term top-k with k <= m is rank- and score-identical to the
  unpruned index while the posting store shrinks by orders of magnitude
  for stopword-scale terms.  This is the scale lever for a serving tier:
  the full index stays on cheap storage, the pruned one serves.
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.index.builder import InvertedIndex
from lucenenet_spark.search.searcher import B, K1, IndexSearcher


def shard_merge_topk(
    searcher: IndexSearcher,
    query,
    n_shards: int = 4,
    k: int = 10,
    quantum: float = 10000.0,
) -> DataFrame:
    """Per-shard top-k then TopDocs.Merge, over contiguous doc_id slices.

    Returns (rank, shard_id, doc_id, score_q): the merged global page with
    the shard each hit was served from.  Scores are quantized BEFORE the
    per-shard selection so the shard-local tie-break (score_q DESC,
    doc_id ASC) composes exactly with the merge order (score_q DESC,
    shard ASC, local doc ASC) into the global single-searcher order.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    span = max(1, math.ceil(searcher.index.max_doc / n_shards))
    scored = searcher.scored(query).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(quantum) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    sliced = scored.withColumn(
        "shard_id", (F.col("doc_id") / F.lit(span)).cast("long")
    ).withColumn("local_doc", F.col("doc_id") - F.col("shard_id") * F.lit(span))
    # per-shard TopScoreDocCollector: k rows survive per slice
    per_shard = Window.partitionBy("shard_id").orderBy(
        F.desc("score_q"), F.asc("local_doc")
    )
    heads = sliced.withColumn("shard_rank", F.row_number().over(per_shard)).filter(
        F.col("shard_rank") <= k
    )
    # TopDocs.Merge: score DESC, shardIndex ASC, local doc ASC
    merged = heads.orderBy(
        F.desc("score_q"), F.asc("shard_id"), F.asc("local_doc")
    ).limit(k)
    final = Window.orderBy(F.desc("score_q"), F.asc("shard_id"), F.asc("local_doc"))
    return merged.withColumn("rank", F.row_number().over(final)).select(
        "rank", "shard_id", "doc_id", "score_q"
    )


def posting_impact_q(
    df_col, tf_col, dl_col, max_doc: int, avgdl: float, quantum: float = 10000.0
):
    """Quantized per-posting BM25 impact — the double-mode score a
    single-term query assigns this posting (searcher._idf/_score_col
    composition), as one whole-stage-codegen Column expression."""
    n = float(max_doc)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - df_col.cast("double") + F.lit(0.5))
        / (df_col.cast("double") + F.lit(0.5))
    )
    nrm = F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * dl_col.cast("double") / F.lit(avgdl)
    )
    tf = tf_col.cast("double")
    score = idf * F.lit(K1 + 1.0) * tf / (tf + nrm)
    return F.floor(score * F.lit(quantum) + F.lit(0.5)).cast("long")


def prune_index_topm(
    idx: InvertedIndex, m: int, field: str | None = None
) -> InvertedIndex:
    """Static top-m impact pruning of one field's postings (Carmel
    SIGIR'01).  Survivor selection order is (impact_q DESC, doc_id ASC) —
    the same quantized order the oracle and collectors use — so the
    pruned index's single-term top-k (k <= m) is identical to the full
    index's.  Global stats (term_stats, doclens, max_doc, sum_ttf) are
    untouched: survivors score exactly as before."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    fld = field or idx.default_field
    target = idx.postings.filter(F.col("field") == fld)
    rest = idx.postings.filter(F.col("field") != fld)
    avgdl = idx.avgdl_double_for(fld)
    stats = idx.term_stats.filter(F.col("field") == fld).select(
        F.col("field"), F.col("term"), F.col("df")
    )
    impact = posting_impact_q(
        F.col("df"), F.col("tf"), F.col("dl"), idx.max_doc, avgdl
    )
    w = Window.partitionBy("field", "term").orderBy(
        F.desc("impact_q"), F.asc("doc_id")
    )
    pruned = (
        target.join(stats, ["field", "term"])
        .withColumn("impact_q", impact)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .drop("df", "impact_q", "_rk")
        .select(*target.columns)
    )
    return dataclasses.replace(idx, postings=pruned.unionByName(rest))


def cori_shard_ranking(
    index: InvertedIndex,
    terms,
    n_shards: int = 4,
    field: str | None = None,
    b_belief: float = 0.4,
    c_df: float = 50.0,
    c_cw: float = 150.0,
) -> DataFrame:
    """CORI collection selection (Callan, Lu & Croft, "Searching
    Distributed Collections with Inference Networks", SIGIR 1995) — the
    resource-ranking step of federated search: score each shard by how
    likely it is to hold answers for the query, BEFORE fanning out, so a
    broker can route to the most promising shards only.  The third leg
    of the serving story beside shard_merge_topk (merge) and
    prune_index_topm (per-shard store).

    Per term t and shard s with df = df_{t,s}, cw = token count of s,
    acw = mean shard token count, ns = n_shards, cf = #shards with t:

        T = df / (df + c_df + c_cw * cw / acw)
        I = ln((ns + 0.5) / cf) / ln(ns + 1.0)
        belief(t|s) = b + (1 - b) * T * I          (b = 0.4)

    Query score = sum of per-term beliefs (absent term => df=0 => T=0
    => belief b, the CORI default-belief floor).  Shards are the hash
    slices doc_id % n_shards — the routing a broker actually uses.  All
    inputs (df, cw, cf) are exact integers aggregated globally; each
    per-term belief is quantized to an integer BEFORE the cross-term
    sum, so the total never depends on double summation order.
    Output: (rank, shard_id, belief_sum_q6), belief DESC / shard ASC.

    Scale shape: df/cw/cf are tiny per-shard aggregates (shards x terms
    rows), the ranking itself is shards-sized — the broker decision
    costs O(metadata), never a corpus scan at query time.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    fld = field or index.default_field
    spark = index.postings.sparkSession
    shard = (F.col("doc_id") % n_shards).cast("long").alias("shard_id")
    # per-shard collection word counts (exact integers)
    cw = (
        index.doclens.filter(F.col("field") == fld)
        .select(shard, "dl")
        .groupBy("shard_id")
        .agg(F.sum("dl").cast("long").alias("cw"))
    )
    # per-(term, shard) document frequencies
    dfs = (
        index.postings.filter(
            (F.col("field") == fld) & (F.col("term").isin(terms))
        )
        .select("term", shard)
        .groupBy("term", "shard_id")
        .agg(F.count("*").cast("long").alias("df"))
    )
    cf = dfs.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    grid = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .crossJoin(spark.range(n_shards).select(F.col("id").cast("long").alias("shard_id")))
        .join(dfs, ["term", "shard_id"], "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)).cast("long"))
        .join(F.broadcast(cf), "term", "left")
        # cf=0 (term in no shard) would make I = ln(inf); T is 0 there, so
        # pin cf to 1 — belief collapses to the floor b either way
        .withColumn("cf", F.greatest(F.coalesce(F.col("cf"), F.lit(0)), F.lit(1)).cast("long"))
        .join(F.broadcast(cw), "shard_id", "left")
        .withColumn("cw", F.coalesce(F.col("cw"), F.lit(0)).cast("long"))
    )
    acw = cw.agg(F.sum("cw").cast("long").alias("tot")).select(
        (F.col("tot").cast("double") / F.lit(float(n_shards))).alias("acw")
    )
    t_frac = F.col("df").cast("double") / (
        F.col("df").cast("double")
        + F.lit(c_df)
        + F.lit(c_cw) * F.col("cw").cast("double") / F.col("acw")
    )
    i_frac = F.log(
        (F.lit(float(n_shards)) + F.lit(0.5)) / F.col("cf").cast("double")
    ) / F.log(F.lit(float(n_shards) + 1.0))
    belief = F.lit(b_belief) + F.lit(1.0 - b_belief) * t_frac * i_frac
    per_shard = (
        grid.crossJoin(F.broadcast(acw))
        .select(
            "shard_id",
            F.floor(belief * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("belief_q6"),
        )
        .groupBy("shard_id")
        .agg(F.sum("belief_q6").cast("long").alias("belief_sum_q6"))
    )
    w = Window.orderBy(F.desc("belief_sum_q6"), F.asc("shard_id"))
    return per_shard.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "shard_id", "belief_sum_q6")


def _hash_ring(n_shards: int, vnodes: int) -> list[tuple[int, int]]:
    """Sorted (position, shard) ring: 32-bit md5 points for each of the
    n_shards x vnodes virtual nodes.  Driver-side constants — the ring
    is O(shards) metadata, never data."""
    import hashlib

    nodes = []
    for s in range(n_shards):
        for v in range(vnodes):
            h = int(hashlib.md5(f"shard-{s}-vn-{v}".encode()).hexdigest()[:8], 16)
            nodes.append((h, s))
    nodes.sort()
    if len({p for p, _ in nodes}) != len(nodes):  # pragma: no cover
        raise ValueError("virtual-node position collision; raise vnodes bits")
    return nodes


def consistent_hash_route(
    docs: DataFrame,
    n_shards: int,
    vnodes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, shard_id) under consistent hashing (Karger et al.,
    "Consistent Hashing and Random Trees", STOC 1997) — the router an
    elastic serving tier uses so that resharding from N to N+1 nodes
    moves only ~1/(N+1) of the corpus instead of rehashing everything
    (mod-N routing moves almost all of it).

    Each shard owns ``vnodes`` virtual points on a 32-bit md5 ring; a
    doc routes to the first point at or after md5(doc_id), wrapping to
    the smallest point.  The ring is a sorted LITERAL array (shards x
    vnodes entries), so assignment is a map-only Column expression —
    no join, no shuffle, whole-stage codegen at any corpus size.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if vnodes < 1:
        raise ValueError(f"vnodes must be >= 1, got {vnodes}")
    ring = _hash_ring(n_shards, vnodes)
    positions = F.lit([p for p, _ in ring])  # sorted ascending
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8), 16, 10
    ).cast("long")
    succ = F.coalesce(
        F.try_element_at(F.filter(positions, lambda x: x >= F.col("h")), F.lit(1)),
        F.lit(ring[0][0]),
    )
    pos2shard = F.create_map(
        *[F.lit(v) for pair in ring for v in pair]
    )
    return (
        docs.select(F.col(id_col), h.alias("h"))
        .select(F.col(id_col), succ.alias("pos"))
        .select(
            F.col(id_col),
            F.try_element_at(pos2shard, F.col("pos")).cast("long").alias("shard_id"),
        )
    )


def consistent_hash_rebalance(
    docs: DataFrame,
    n_shards: int,
    vnodes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard audit of growing the ring from n_shards to n_shards+1:
    (shard_id, docs_before, docs_after, moved_out), all exact integers.

    The consistent-hashing contract — a doc moves ONLY if one of the
    new shard's virtual points landed between the doc and its old
    successor, so every moved doc lands on the NEW shard:
    sum(moved_out) == docs_after of shard n_shards.  That invariant is
    what makes incremental resharding cheap at 10^12 docs: N->N+1
    touches ~corpus/(N+1) postings, not the whole index.
    """
    before = consistent_hash_route(docs, n_shards, vnodes, id_col).withColumnRenamed(
        "shard_id", "s_before"
    )
    after = consistent_hash_route(docs, n_shards + 1, vnodes, id_col).withColumnRenamed(
        "shard_id", "s_after"
    )
    joined = before.join(after, id_col)
    from_side = joined.groupBy(F.col("s_before").alias("shard_id")).agg(
        F.count("*").cast("long").alias("docs_before"),
        F.sum(F.when(F.col("s_before") != F.col("s_after"), 1).otherwise(0))
        .cast("long")
        .alias("moved_out"),
    )
    to_side = joined.groupBy(F.col("s_after").alias("shard_id")).agg(
        F.count("*").cast("long").alias("docs_after")
    )
    return (
        from_side.join(to_side, "shard_id", "full_outer")
        .select(
            F.col("shard_id").cast("long").alias("shard_id"),
            F.coalesce(F.col("docs_before"), F.lit(0)).cast("long").alias("docs_before"),
            F.coalesce(F.col("docs_after"), F.lit(0)).cast("long").alias("docs_after"),
            F.coalesce(F.col("moved_out"), F.lit(0)).cast("long").alias("moved_out"),
        )
        .orderBy("shard_id")
    )


def cori_routed_topk(
    searcher: IndexSearcher,
    term: str,
    n_shards: int = 4,
    n_probe: int = 2,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """End-to-end federated query: CORI picks the ``n_probe`` most
    promising shards (cori_shard_ranking), ONLY those shards are
    searched, and their results merge into one page — the full broker
    path of Callan's federated-search architecture (resource ranking ->
    selective fan-out -> merge), composed from this module's verified
    pieces.  Scoring uses GLOBAL collection statistics (the engine's
    normal scored() path), i.e. the global-IDF exchange a production
    broker performs, so selected shards score identically to a
    single-searcher run over their union.

    The page also audits what selective routing cost: global_overlap =
    |federated top-k ∩ unrestricted global top-k| (an exact integer),
    the broker's recall-at-probe dial — probing all shards makes it k,
    probing fewer trades recall for fan-out.

    Output: (rank, doc_id, shard_id, score_q, global_overlap).
    """
    if not (1 <= n_probe <= n_shards):
        raise ValueError(f"need 1 <= n_probe <= n_shards, got {n_probe}/{n_shards}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from lucenenet_spark.search.queries import TermQuery

    idx = searcher.index
    chosen = (
        cori_shard_ranking(idx, [term], n_shards=n_shards, field=field)
        .filter(F.col("rank") <= n_probe)
        .select("shard_id")
    )
    scored = searcher.scored(TermQuery(term, field=field)).select(
        "doc_id",
        (F.col("doc_id") % n_shards).cast("long").alias("shard_id"),
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    fed = scored.join(F.broadcast(chosen), "shard_id")
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    page = fed.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
    global_top = (
        scored.withColumn("grank", F.row_number().over(w))
        .filter(F.col("grank") <= k)
        .select(F.col("doc_id").alias("gdoc"))
    )
    overlap = (
        page.join(global_top, page.doc_id == global_top.gdoc)
        .agg(F.count(F.lit(1)).cast("long").alias("global_overlap"))
    )
    return page.crossJoin(F.broadcast(overlap)).select(
        "rank", "doc_id", "shard_id", "score_q", "global_overlap"
    )


def tiered_serving_certificate(
    idx: InvertedIndex,
    term: str,
    m: int = 20,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """Two-tier serving with an EXACTNESS CERTIFICATE — the
    champion-list architecture (Manning, Raghavan & Schütze, IIR §7.1.3
    tiered indexes; Carmel SIGIR'01 pruning): tier 1 holds each term's
    top-m postings by quantized impact (prune_index_topm's selection),
    tier 2 the rest on cold storage.  A query is served from tier 1
    alone, and the page carries a machine-checkable certificate:

        certified = (k-th tier-1 score) >= (max impact left in tier 2)

    When it holds, no tier-2 posting could displace any served result,
    so the tier-1 page IS the full-index page — the broker skips the
    cold tier with proof, not hope.  When it fails, the broker knows to
    fall back.  All quantities are the same quantized-impact bigints
    the pruning uses, so the certificate is exact.

    Output: (rank, doc_id, score_q, tier2_max_q, certified) with
    certified as 0/1.  Terms with <= m postings have an empty tier 2
    (tier2_max_q = 0, certified = 1).
    """
    if m < 1 or k < 1 or k > m:
        raise ValueError(f"need 1 <= k <= m, got k={k} m={m}")
    fld = field or idx.default_field
    avgdl = idx.avgdl_double_for(fld)
    stats = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).select("df")
    p = idx.postings.filter(
        (F.col("field") == fld) & (F.col("term") == term)
    ).crossJoin(F.broadcast(stats))
    impact = posting_impact_q(
        F.col("df"), F.col("tf"), F.col("dl"), idx.max_doc, avgdl
    )
    w = Window.orderBy(F.desc("impact_q"), F.asc("doc_id"))
    ranked = p.withColumn("impact_q", impact).withColumn(
        "_tier_rk", F.row_number().over(w)
    )
    tier1 = ranked.filter(F.col("_tier_rk") <= m)
    tier2_max = ranked.filter(F.col("_tier_rk") > m).agg(
        F.coalesce(F.max("impact_q"), F.lit(0)).cast("long").alias("tier2_max_q")
    )
    pw = Window.orderBy(F.desc("impact_q"), F.asc("doc_id"))
    page = tier1.withColumn("rank", F.row_number().over(pw).cast("long")).filter(
        F.col("rank") <= k
    )
    kth = page.agg(F.min("impact_q").cast("long").alias("kth_q"))
    return (
        page.select("rank", "doc_id", F.col("impact_q").alias("score_q"))
        .crossJoin(F.broadcast(tier2_max))
        .crossJoin(F.broadcast(kth))
        .select(
            "rank",
            "doc_id",
            "score_q",
            "tier2_max_q",
            F.when(F.col("kth_q") >= F.col("tier2_max_q"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("certified"),
        )
    )


def partitioning_cost_model(
    idx: InvertedIndex,
    terms,
    n_shards: int = 4,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """Document- vs term-partitioned index network cost for one query
    (Moffat, Webber, Zobel & Baeza-Yates, "A Pipelined Architecture for
    Distributed Text Query Evaluation", Information Retrieval 2007; the
    Tomasic & Garcia-Molina trade-off): the capacity-planning decision
    every distributed engine makes once, from catalog statistics alone.

    * doc_partitioned — every shard holds a corpus slice and evaluates
      the whole query: query_messages = S (broadcast), network_rows =
      S·k (each shard returns its local top-k for the merge;
      shard_merge_topk is this plan's execution).
    * term_partitioned — each term's whole posting list lives on
      hash(term) % S; the shard owning the RAREST query term (min df,
      term ASC — the cheapest pipeline head) coordinates, and every
      other involved shard ships its term's full posting list:
      network_rows = Σ df(t) over terms NOT resident on the
      coordinator, query_messages = |involved shards|.

    All quantities come from term_stats — O(|q|) catalog rows, no data
    scan; term->shard uses the engine's 32-bit md5 convention.  Output:
    (strategy, query_messages, network_rows).
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if n_shards < 1 or k < 1:
        raise ValueError(f"need n_shards >= 1 and k >= 1, got {n_shards}/{k}")
    fld = field or idx.default_field
    spark = idx.postings.sparkSession
    st = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term").isin(terms))
    ).select(
        "term",
        F.col("df").cast("long").alias("df"),
        (
            F.conv(F.substring(F.md5(F.col("term").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % n_shards
        ).alias("shard"),
    )
    coord = (
        st.orderBy(F.asc("df"), F.asc("term"))
        .limit(1)
        .select(F.col("shard").alias("cshard"))
    )
    tp = st.crossJoin(F.broadcast(coord)).agg(
        F.count_distinct("shard").cast("long").alias("query_messages"),
        F.sum(F.when(F.col("shard") != F.col("cshard"), F.col("df")).otherwise(0))
        .cast("long")
        .alias("network_rows"),
    ).select(
        F.lit("term_partitioned").alias("strategy"),
        "query_messages",
        "network_rows",
    )
    dp = spark.range(1).select(
        F.lit("doc_partitioned").alias("strategy"),
        F.lit(n_shards).cast("long").alias("query_messages"),
        F.lit(n_shards * k).cast("long").alias("network_rows"),
    )
    return dp.unionByName(tp)


def redde_shard_selection(
    searcher: IndexSearcher,
    docs: DataFrame,
    term: str,
    shard_col: str = "source",
    sample_mod: int = 5,
    n_sample_top: int = 50,
    field: str | None = None,
) -> DataFrame:
    """ReDDE resource selection (Si & Callan, "Relevant Document
    Distribution Estimation Method for Resource Selection", SIGIR
    2003) — the SAMPLE-based alternative to CORI's statistics-based
    ranking, and the shard picker of selective search (Kulkarni &
    Callan): run the query against a small centralized sample of all
    shards, and estimate each shard's relevant-document count as

        est_docs(shard) = |sample top-n ∩ shard| · (1 / sample_rate)

    Shards here are the ``shard_col`` groups (topical shards — the
    selective-search layout); the sample is the deterministic 1-in-
    ``sample_mod`` slice doc_id % sample_mod == 0, scored by the
    engine's normal global-stats BM25 (the centralized sample index).
    Where CORI needs per-shard df/cw exchanges, ReDDE needs only ONE
    query over a sample a thousandth the corpus size — which is why it
    scales to thousands of topical shards.

    Output: (rank, shard, sample_hits, est_docs), ranked
    (est_docs DESC, shard ASC); exact integers (est = hits ·
    sample_mod).
    """
    if sample_mod < 1 or n_sample_top < 1:
        raise ValueError(f"need sample_mod >= 1 and n_sample_top >= 1")
    from lucenenet_spark.search.queries import TermQuery

    scored = searcher.scored(TermQuery(term, field=field)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    )
    sample = scored.filter(F.col("doc_id") % sample_mod == 0)
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    top = sample.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= n_sample_top
    )
    hits = (
        top.join(docs.select("doc_id", F.col(shard_col).alias("shard")), "doc_id")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("sample_hits"))
        .withColumn(
            "est_docs", (F.col("sample_hits") * F.lit(sample_mod)).cast("long")
        )
    )
    rw = Window.orderBy(F.desc("est_docs"), F.asc("shard"))
    return hits.withColumn("rank", F.row_number().over(rw).cast("long")).select(
        "rank", "shard", "sample_hits", "est_docs"
    )


def selective_search_topk(
    searcher: IndexSearcher,
    docs: DataFrame,
    term: str,
    shard_col: str = "source",
    n_probe: int = 3,
    k: int = 10,
    sample_mod: int = 5,
    n_sample_top: int = 50,
    field: str | None = None,
) -> DataFrame:
    """Selective search end-to-end (Kulkarni & Callan, "Selective
    Search: Efficient and Effective Search of Large Textual
    Collections", ACM TOIS 2015): the corpus lives in TOPICAL shards
    (here the ``shard_col`` groups), ReDDE ranks them from a
    centralized sample, and only the top ``n_probe`` shards are
    searched — the architecture that serves a 10^12-doc corpus by
    touching a few percent of it per query.  The sibling of
    cori_routed_topk with sample-based (not statistics-based) routing
    and topical (not hash) shards; scoring stays global-stats exact on
    the probed subset.

    Output: (rank, doc_id, shard, score_q, global_overlap) — the page
    plus the exact recall-at-probe audit.
    """
    if not (1 <= n_probe) or k < 1:
        raise ValueError(f"need n_probe >= 1 and k >= 1, got {n_probe}/{k}")
    from lucenenet_spark.search.queries import TermQuery

    chosen = (
        redde_shard_selection(
            searcher, docs, term, shard_col=shard_col,
            sample_mod=sample_mod, n_sample_top=n_sample_top, field=field,
        )
        .filter(F.col("rank") <= n_probe)
        .select("shard")
    )
    scored = searcher.scored(TermQuery(term, field=field)).select(
        "doc_id",
        F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5)).cast("long").alias("score_q"),
    ).join(docs.select("doc_id", F.col(shard_col).alias("shard")), "doc_id")
    fed = scored.join(F.broadcast(chosen), "shard")
    w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
    page = fed.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
    gtop = (
        scored.withColumn("g", F.row_number().over(w))
        .filter(F.col("g") <= k)
        .select(F.col("doc_id").alias("gdoc"))
    )
    ov = page.join(gtop, page.doc_id == gtop.gdoc).agg(
        F.count(F.lit(1)).cast("long").alias("global_overlap")
    )
    return page.crossJoin(F.broadcast(ov)).select(
        "rank", "doc_id", "shard", "score_q", "global_overlap"
    )


def local_idf_divergence(
    idx: InvertedIndex,
    terms,
    n_shards: int = 4,
    field: str | None = None,
) -> DataFrame:
    """Local-vs-global IDF divergence audit — the quantified version of
    federated search's oldest correctness problem (de Kretser, Moffat,
    Shimmin & Zobel, "Methodologies for Distributed Information
    Retrieval", ICDCS 1998; why cori_routed_topk exchanges GLOBAL
    stats): a shard scoring with its LOCAL df produces idf values that
    diverge from the global ones, so identical documents rank
    differently on different shards.

    Per term and hash shard (doc_id % n_shards):

        idf_local  = ln(1 + (n_s - df_s + 0.5) / (df_s + 0.5))
        idf_global = same with global N, df

    Output per term: (term, df, idf_global_q6, max_abs_dev_q6,
    n_shards_present) where the deviation is max over shards of
    |idf_local_q6 - idf_global_q6| — both quantized BEFORE the
    difference, so the row is integer-exact.  The number every
    global-stats exchange design doc should quote.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    fld = field or idx.default_field
    n = float(idx.max_doc)

    def _idf_q6(df_col, n_col):
        return F.floor(
            F.log(
                F.lit(1.0)
                + (n_col - df_col.cast("double") + F.lit(0.5))
                / (df_col.cast("double") + F.lit(0.5))
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    shard = (F.col("doc_id") % n_shards).cast("long").alias("shard")
    ns = (
        idx.doclens.filter(F.col("field") == fld)
        .select(shard, "doc_id")
        .distinct()
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    )
    dfs = (
        idx.postings.filter(
            (F.col("field") == fld) & (F.col("term").isin(terms))
        )
        .select("term", shard)
        .groupBy("term", "shard")
        .agg(F.count(F.lit(1)).cast("long").alias("df_s"))
    )
    g = idx.term_stats.filter(
        (F.col("field") == fld) & (F.col("term").isin(terms))
    ).select("term", F.col("df").cast("long").alias("df"))
    local = dfs.join(ns, "shard").select(
        "term",
        "shard",
        _idf_q6(F.col("df_s"), F.col("n_s").cast("double")).alias("idf_local_q6"),
    )
    glob = g.select(
        "term", "df", _idf_q6(F.col("df"), F.lit(n)).alias("idf_global_q6")
    )
    return (
        local.join(glob, "term")
        .groupBy("term", "df", "idf_global_q6")
        .agg(
            F.max(F.abs(F.col("idf_local_q6") - F.col("idf_global_q6")))
            .cast("long")
            .alias("max_abs_dev_q6"),
            F.count(F.lit(1)).cast("long").alias("n_shards_present"),
        )
    )


def distributed_topk_terms(
    index, n_shards: int = 4, shard_k: int = 20, k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """Approximate distributed top-k terms with exact error bounds —
    the Threshold-Algorithm family (Fagin, Lotem & Naor, "Optimal
    aggregation algorithms for middleware", PODS 2001; TPUT, Cao &
    Wang PODC 2004): each shard ships only its local top ``shard_k``
    (term, count) rows; the broker sums what arrived and bounds what
    it cannot see by each non-reporting shard's k-th local count.

    Per result term: (term, est_count, true_count, err_bound,
    is_exact) — est_count <= true_count <= est_count + err_bound holds
    by construction and the gate's oracle re-proves it.  Shards are
    doc_id % n_shards; all counts exact integers.  This is the
    shard_size/doc_count_error story of every distributed terms
    aggregation: only shards×shard_k rows cross the network instead of
    the full dictionary.
    """
    if n_shards < 1 or shard_k < 1 or k < 1:
        raise ValueError("n_shards, shard_k and k must be >= 1")
    fld = field or index.default_field
    p = index.postings.filter(F.col("field") == fld).select(
        "term", (F.col("doc_id") % n_shards).alias("shard")
    )
    local = p.groupBy("shard", "term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("term"))
    ranked = local.withColumn("rn", F.row_number().over(w))
    reported = ranked.filter(F.col("rn") <= shard_k)
    # each shard's admission threshold: its shard_k-th local count
    # (0 if the shard holds fewer than shard_k distinct terms)
    thr = (
        ranked.filter(F.col("rn") == shard_k)
        .select("shard", F.col("cnt").alias("thr"))
    )
    total_thr = thr.agg(F.coalesce(F.sum("thr"), F.lit(0)).cast("long").alias("sum_thr"))
    est = reported.groupBy("term").agg(
        F.sum("cnt").cast("long").alias("est_count")
    )
    # threshold mass of the shards that DID report the term
    seen_thr = (
        reported.join(thr, "shard", "left")
        .groupBy("term")
        .agg(F.coalesce(F.sum("thr"), F.lit(0)).cast("long").alias("seen_thr"))
    )
    truth = local.groupBy("term").agg(F.sum("cnt").cast("long").alias("true_count"))
    out = (
        est.join(seen_thr, "term")
        .crossJoin(total_thr)
        .join(truth, "term")
        .select(
            "term",
            "est_count",
            "true_count",
            (F.col("sum_thr") - F.col("seen_thr")).cast("long").alias("err_bound"),
            (F.col("est_count") == F.col("true_count")).alias("is_exact"),
        )
    )
    return out.orderBy(F.desc("est_count"), F.asc("term")).limit(k)
