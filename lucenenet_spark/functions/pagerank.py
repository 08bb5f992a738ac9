"""Distributed PageRank over a document link graph.

A web-scale corpus engine needs link-graph signals: PageRank (Page,
Brin, Motwani, Winograd 1999, "The PageRank Citation Ranking") is the
canonical quality prior used by every published web-curation pipeline
that ranks pages before filtering (e.g. the Common Crawl harmonic/
PageRank centrality releases). This module implements the power
iteration as pure DataFrame ops — the textbook bulk-synchronous
formulation that shipped in Pregel/GraphX, re-expressed Spark-first:

    pr'(v) = (1-d)/N + d * sum_{u -> v} pr(u) / outdeg(u)

Scale design (the part that must survive 100 TB):
- The edge table carries (src, dst, deg) with deg denormalized onto
  every edge, so one hash join edges⋈ranks on ``src`` plus one
  map-side-combinable groupBy(dst) is the whole iteration — no
  driver-side graph state, no collect.
- Edges are persisted once and reused across iterations; each rank
  frame is persisted and the previous one released, so iteration k
  recomputes nothing and the lineage stays O(1).
- On a real cluster you would bucket/pre-partition the edge table by
  ``src`` (it is iteration-invariant), making the per-iteration join
  one-sided: only the small rank table shuffles. Hub pages (huge
  in-degree) skew the groupBy(dst); AQE skew-join handles it, and the
  partial aggregation means the hot key arrives pre-combined.
- No dangling-node mass pass is needed for graphs where every node
  has outdeg >= 1 (the synthetic graph below guarantees it); for a
  crawl graph, add the standard dangling-mass scalar (one agg per
  iteration, broadcast back) — same plan shape.

The synthetic link graph ``build_link_graph`` is fully deterministic
integer arithmetic (Knuth multiplicative hash) so a SQL oracle can
reproduce it bit-for-bit: node ``s`` emits ``1 + s % 3`` edges, edge j
targets ``(s*2654435761 + 40503*(j+1)) % N``, self-loops deflected to
the next node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.functions._tracked import RoundScope

_KCORE_SCOPE = RoundScope()
_BFS_SCOPE = RoundScope()

KNUTH = 2654435761
STRIDE = 40503


def build_link_graph(nodes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic web graph over the corpus doc ids:
    (src, dst, deg) with deg = 1 + src % 3 denormalized per edge.
    Multigraph semantics (collisions keep their multiplicity). Assumes
    the dense 0..N-1 id space of the testdata corpus — targets are
    drawn modulo N, so a sparse id set would shed rank mass onto
    nonexistent nodes (rank a real crawl graph on its own edge list
    instead of this synthetic generator)."""
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    edges = (
        nodes.select(F.col(id_col).cast("long").alias("src"))
        .crossJoin(F.broadcast(n_df))
        .select(
            "src",
            "_n",
            F.explode(F.sequence(F.lit(0), (F.col("src") % 3).cast("int"))).alias(
                "j"
            ),
        )
        .select(
            "src",
            # reduce src mod N BEFORE the Knuth multiply: the int64
            # overflow ceiling then depends on corpus SIZE (N <= ~3.4e9
            # before (N-1)*KNUTH wraps), not on id magnitude
            (((F.col("src") % F.col("_n")) * F.lit(KNUTH) + F.lit(STRIDE) * (F.col("j") + 1)) % F.col("_n")).alias("t"),
            "_n",
            (F.col("src") % 3 + 1).cast("long").alias("deg"),
        )
        .select(
            "src",
            F.when(F.col("t") == F.col("src"), (F.col("t") + 1) % F.col("_n"))
            .otherwise(F.col("t"))
            .alias("dst"),
            "deg",
        )
    )
    return edges


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    id_col: str = "doc_id",
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank: returns (id_col, pr double). ``edges``
    must carry (src, dst, deg) with deg = outdeg(src) on every row.
    Fixed iteration count (the published 5-15 sweep; convergence tests
    belong to the caller), no dangling mass (every node must have
    deg >= 1 — true for build_link_graph).

    ``teleport`` personalizes the jump (Haveliwala WWW'02,
    "Topic-Sensitive PageRank"): an (id_col, tp) frame whose tp sums
    to 1 — rank mass teleports only onto those nodes, yielding
    seed-relative importance (TrustRank/topic PageRank shape). None =
    the uniform 1/N vector of classic PageRank. The start vector
    equals the teleport vector, so the uniform default is unchanged."""
    n = nodes.count()
    ids = nodes.select(F.col(id_col).cast("long").alias(id_col))
    if teleport is None:
        tp = ids.select(id_col, (F.lit(1.0) / F.lit(float(n))).alias("tp"))
    else:
        tp = ids.join(teleport, id_col, "left").select(
            id_col, F.coalesce(F.col("tp"), F.lit(0.0)).alias("tp")
        )
    tp = tp.persist()
    edges = edges.persist()
    ranks = tp.select(id_col, F.col("tp").alias("pr")).persist()
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.select(F.col(id_col).alias("src"), "pr"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("m"))
        )
        new = (
            tp.join(contrib, tp[id_col] == contrib["dst"], "left")
            .select(
                id_col,
                (
                    F.lit(1.0 - damping) * F.col("tp")
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("pr"),
            )
            .persist()
        )
        new.count()  # materialize before releasing the parent
        ranks.unpersist()
        ranks = new
    edges.unpersist()
    tp.unpersist()
    return ranks


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg, JACM'99 "Authoritative
    sources in a hyperlinked environment"): returns (id_col, a, h) —
    authority and hub scores. Requires iterations >= 1. The returned
    frame references the final persisted iteration vectors (tiny, one
    row per node); callers that loop many graphs should unpersist via
    Spark's storage LRU or df.unpersist() after consumption.
    Power iteration from the all-ones hub vector; each half-step
    L1-normalizes (divide by the sum of raw contributions — same fixed
    point as the published L2 normalization up to scale, and division-
    only arithmetic keeps the SQL oracle bit-comparable).

    Scale shape is identical to :func:`pagerank`: per half-step one
    hash join edges⋈vector plus one map-side-combinable groupBy, the
    normalizer is a single-row agg broadcast back — no driver state
    beyond the loop counter."""
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1")
    ids = nodes.select(F.col(id_col).cast("long").alias(id_col))
    edges = edges.persist()
    hub = ids.select(id_col, F.lit(1.0).alias("h")).persist()
    auth = None
    for _ in range(iterations):
        a_raw = (
            edges.join(hub.select(F.col(id_col).alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        a_sum = a_raw.agg(F.sum("a").alias("_s"))
        new_auth = (
            ids.join(a_raw, ids[id_col] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_sum))
            .select(
                id_col,
                (F.coalesce(F.col("a"), F.lit(0.0)) / F.col("_s")).alias("a"),
            )
            .persist()
        )
        new_auth.count()
        if auth is not None:
            auth.unpersist()
        auth = new_auth
        h_raw = (
            edges.join(auth.select(F.col(id_col).alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
        )
        h_sum = h_raw.agg(F.sum("hr").alias("_s"))
        new_hub = (
            ids.join(h_raw, ids[id_col] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_sum))
            .select(
                id_col,
                (F.coalesce(F.col("hr"), F.lit(0.0)) / F.col("_s")).alias("h"),
            )
            .persist()
        )
        new_hub.count()
        hub.unpersist()
        hub = new_hub
    out = ids.join(auth, id_col).join(hub, id_col).select(id_col, "a", "h")
    edges.unpersist()
    return out


def pagerank_topk(
    docs: DataFrame,
    k: int = 20,
    damping: float = 0.85,
    iterations: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus documents by PageRank over the deterministic link
    graph, quantized for the oracle: (doc_id, rank_q bigint), ordered
    rank_q DESC, doc_id ASC."""
    nodes = docs.select(id_col)
    pr = pagerank(
        nodes, build_link_graph(nodes, id_col), damping=damping,
        iterations=iterations, id_col=id_col,
    )
    out = (
        pr.select(
            id_col,
            F.floor(F.col("pr") * F.lit(10000000.0) + F.lit(0.5))
            .cast("long")
            .alias("rank_q"),
        )
        .orderBy(F.col("rank_q").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return out


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row link-graph diagnostics: node/edge counts, degree extremes,
    self-loops, and reciprocity (Broder et al. WWW'00 "Graph structure
    in the web" measures) — the sanity panel a crawl-graph pipeline
    emits before ranking.

    reciprocal_pairs counts unordered {a,b} with BOTH a->b and b->a in
    the DISTINCT edge set: dedup, one self-equi-join on the reversed
    key, count(a<b). All aggregates partial/map-side combinable; the
    join is the only shuffle pair and both sides are the deduped edge
    list (≪ multigraph edges on a real crawl).
    """
    e = edges.select("src", "dst")
    d = e.distinct().persist()
    rec = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")),
        )
        .filter(F.col("a.src") < F.col("a.dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("reciprocal_pairs"))
    )
    outd = d.groupBy("src").agg(F.count(F.lit(1)).alias("od")).agg(
        F.max("od").cast("long").alias("max_out_degree")
    )
    ind = d.groupBy("dst").agg(F.count(F.lit(1)).alias("idg")).agg(
        F.max("idg").cast("long").alias("max_in_degree")
    )
    base = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.countDistinct("src").cast("long").alias("n_src_nodes"),
        F.countDistinct("dst").cast("long").alias("n_dst_nodes"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0))
        .cast("long")
        .alias("self_loops"),
    )
    dd = d.agg(F.count(F.lit(1)).cast("long").alias("n_distinct_edges"))
    out = base.crossJoin(dd).crossJoin(outd).crossJoin(ind).crossJoin(rec)
    return out


def spam_mass(
    docs: DataFrame,
    trusted_mod: int = 10,
    damping: float = 0.85,
    iterations: int = 5,
    k: int = 20,
) -> DataFrame:
    """Link-spam mass estimation (Gyöngyi, Garcia-Molina & Pedersen,
    "Link Spam Detection Based on Mass Estimation", VLDB 2006): the
    fraction of a page's PageRank that does NOT flow from a trusted
    core.  With p = classic PageRank and p' = PageRank whose teleport
    vector puts 1/n on each trusted node (and 0 elsewhere), the
    relative spam mass is  m(x) = (p(x) - p'(x)) / p(x);  pages whose
    rank is mostly unexplained by the good core are link-spam suspects.

    p' is obtained from the existing seeded pagerank() (teleport 1/|S|
    per seed) scaled by |S|/n — PageRank is linear in the teleport
    vector, so this equals the paper's core-based p' exactly while
    reusing the verified PPR loop.  Trusted core = doc_id %
    trusted_mod == 0, the same seed set as the personalized_pagerank
    gate.  Output: (doc_id, pr_q, sm_q5) — top k by relative spam
    mass (quantized 1e5) with doc-id tie-break.
    """
    nodes = docs.select("doc_id")
    n = nodes.count()
    edges = build_link_graph(nodes)
    seeds = nodes.filter(F.col("doc_id") % trusted_mod == 0)
    s = seeds.count()
    teleport = seeds.select("doc_id", (F.lit(1.0) / F.lit(float(s))).alias("tp"))
    pr = pagerank(nodes, edges, damping=damping, iterations=iterations)
    ppr = pagerank(
        nodes, edges, damping=damping, iterations=iterations, teleport=teleport
    ).select(F.col("doc_id"), F.col("pr").alias("ppr"))
    scale = F.lit(float(s)) / F.lit(float(n))
    joined = pr.join(ppr, "doc_id").select(
        "doc_id",
        F.floor(F.col("pr") * F.lit(1e7) + F.lit(0.5)).cast("long").alias("pr_q"),
        F.floor(
            (F.col("pr") - F.col("ppr") * scale) / F.col("pr") * F.lit(1e5)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("sm_q5"),
    )
    return joined.orderBy(F.desc("sm_q5"), F.asc("doc_id")).limit(k)


def salsa(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """SALSA authority scores (Lempel & Moran, "The stochastic approach
    for link-structure analysis", WWW 2000): HITS's mutual
    reinforcement replaced by a random walk on the bipartite hub/
    authority graph — step BACK to a uniform in-neighbor, then FORWARD
    to a uniform out-neighbor.  The walk is stochastic, so no
    normalization step is needed (mass is conserved exactly — the
    pytest twin asserts it), and unlike HITS the scores are not
    dominated by the largest dense community — the TKC effect SALSA
    was introduced to fix.

    Each iteration is two joins + two map-side-combinable aggregations:
      b(i)  = Σ_{j : i→j}  a(j) / indeg(j)      (back-step)
      a'(j) = Σ_{i : i→j}  b(i) / outdeg(i)     (forward-step)
    with multigraph multiplicity (edges carry deg = outdeg(src);
    indeg(dst) counted once and broadcast).  Returns (id_col, a).
    """
    n = nodes.count()
    ids = nodes.select(F.col(id_col).cast("long").alias(id_col))
    indeg = edges.groupBy("dst").agg(F.count("*").cast("long").alias("ind"))
    edges = edges.join(indeg, "dst").persist()
    a = ids.select(id_col, (F.lit(1.0) / F.lit(float(n))).alias("a")).persist()
    for _ in range(iterations):
        back = (
            edges.join(a.select(F.col(id_col).alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("a") / F.col("ind")).alias("b"))
        )
        fwd = (
            edges.join(back, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("b") / F.col("deg")).alias("anew"))
        )
        new = (
            ids.join(fwd, ids[id_col] == fwd["dst"], "left")
            .select(id_col, F.coalesce(F.col("anew"), F.lit(0.0)).alias("a"))
            .persist()
        )
        new.count()
        a.unpersist()
        a = new
    edges.unpersist()
    return a


def hostrank_topk(
    docs: DataFrame,
    iterations: int = 4,
    k: int = 10,
    host_col: str = "source",
    damping: float = 0.85,
) -> DataFrame:
    """Host-level PageRank (Kamvar, Haveliwala, Manning & Golub,
    "Exploiting the Block Structure of the Web for Computing PageRank",
    Stanford 2003; the HostRank aggregation every crawler uses for
    host-level budgets): collapse the page graph onto hosts and rank
    the HOST graph — two orders of magnitude fewer nodes, and the
    per-host score that drives crawl scheduling and spam triage.

    Edges: the deterministic page graph (build_link_graph) with both
    endpoints mapped to their host; MULTIGRAPH semantics keep one row
    per page-level link, so a host pair linked by 10 pages carries 10x
    the rank flow of a single link — the natural weighting — and
    deg(host) is its total out-link count (self-links kept: every host
    has deg >= 1, the pagerank() contract).  Hosts map to dense ids by
    sorted order (the textrank discipline) so the verified pagerank
    loop runs unchanged.

    Output: (rank, host, pr_q7), pr quantized 1e7 (the pagerank-gate
    tolerance for double-sum ulps), (pr DESC, host ASC).
    """
    if iterations < 1 or k < 1:
        raise ValueError(f"need iterations >= 1 and k >= 1")
    from pyspark.sql import Window

    page_edges = build_link_graph(docs)
    hmap = docs.select(F.col("doc_id").cast("long").alias("d"), F.col(host_col).alias("h"))
    hedges = (
        page_edges.join(hmap.select(F.col("d").alias("src"), F.col("h").alias("hs")), "src")
        .join(hmap.select(F.col("d").alias("dst"), F.col("h").alias("hd")), "dst")
        .select("hs", "hd")
    )
    hosts = hedges.select(F.col("hs").alias("h")).unionByName(
        hedges.select(F.col("hd").alias("h"))
    ).distinct()
    wid = hosts.withColumn(
        "wid",
        (F.row_number().over(Window.orderBy(F.asc("h"))) - F.lit(1)).cast("long"),
    ).persist()
    hdeg = hedges.groupBy("hs").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    edges = (
        hedges.join(hdeg, "hs")
        .join(wid.select(F.col("h").alias("hs"), F.col("wid").alias("src")), "hs")
        .join(wid.select(F.col("h").alias("hd"), F.col("wid").alias("dst")), "hd")
        .select("src", "dst", "deg")
    )
    nodes = wid.select(F.col("wid").alias("nid"))
    pr = pagerank(nodes, edges, damping=damping, iterations=iterations, id_col="nid")
    out = pr.join(wid.select(F.col("wid").alias("nid"), "h"), "nid").select(
        F.col("h").alias("host"),
        F.floor(F.col("pr") * F.lit(10000000.0) + F.lit(0.5)).cast("long").alias("pr_q7"),
    )
    w = Window.orderBy(F.desc("pr_q7"), F.asc("host"))
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "host", "pr_q7")
    )


def webgraph_locality(
    docs: DataFrame, window: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Link-locality audit — the empirical property Boldi & Vigna's
    WebGraph framework ("The WebGraph Framework I: Compression
    Techniques", WWW 2004) compresses: under a URL-sorted id order,
    most links point to NEARBY ids (same host, same directory), so
    gap coding + referential copying reach ~3 bits/link.  Reported
    over the deterministic page graph:

        within_window  = |{edges: |src - dst| <= W}|    (W = 16,
                         Boldi-Vigna's default window)
        gap_bits       = Σ bit_length(|src - dst| + 1)  exact info
                         content of the signed-gap stream

    Output one row: (n_edges, within_window, window, gap_bits,
    mean_gap_bits_q6) — all integers but the final quantized mean.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    edges = build_link_graph(docs.select(F.col(id_col).alias("doc_id")))
    g = edges.select(
        F.abs(F.col("src") - F.col("dst")).cast("long").alias("gap")
    )
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.when(F.col("gap") <= window, 1).otherwise(0))
        .cast("long")
        .alias("within_window"),
        F.lit(window).cast("long").alias("window"),
        F.sum(
            F.length(F.conv((F.col("gap") + F.lit(1)).cast("string"), 10, 2))
        )
        .cast("long")
        .alias("gap_bits"),
    ).select(
        "n_edges",
        "within_window",
        "window",
        "gap_bits",
        F.floor(
            F.col("gap_bits").cast("double") / F.col("n_edges").cast("double")
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mean_gap_bits_q6"),
    )


def undirected_simple(edges: DataFrame) -> DataFrame:
    """Directed multigraph -> undirected simple edge list (a < b),
    self-loops dropped — the canonical form triangle counting needs."""
    return (
        edges.select(
            F.least(F.col("src"), F.col("dst")).alias("a"),
            F.greatest(F.col("src"), F.col("dst")).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph —
    the node-iterator/wedge-closure join (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW 2011:
    the MapReduce formulation this DataFrame plan is the declarative
    twin of).  Wedges are enumerated once per ordered pair (b < c both
    adjacent to a) and closed against the edge list, so every triangle
    is produced exactly once and then credited to its three corners.
    Returns (node, tri); nodes in no triangle are absent.

    Skew note (the paper's 'last reducer'): wedge count per node is
    C(deg,2) — on power-law crawl graphs cap or sample hub wedges; the
    synthetic gate graph has max degree ~6 so the plain join is exact
    AND cheap here.
    """
    und = undirected_simple(edges).persist()
    e1 = und.select(F.col("a").alias("apex"), F.col("b").alias("x"))
    e2 = und.select(F.col("a").alias("apex"), F.col("b").alias("y"))
    lo = und.select(F.col("b").alias("apex"), F.col("a").alias("x"))
    lo2 = und.select(F.col("b").alias("apex"), F.col("a").alias("y"))
    nbr1 = e1.unionByName(lo)
    nbr2 = e2.unionByName(lo2)
    # apex < x < y: every triangle is enumerated exactly once, at its
    # smallest vertex (without the apex bound each closes 3x, once per
    # corner — caught by the brute-force twin)
    wedges = nbr1.join(nbr2, "apex").filter(
        (F.col("apex") < F.col("x")) & (F.col("x") < F.col("y"))
    )
    tri = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")), ["x", "y"]
    ).select(F.col("apex").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3"))
    per = (
        tri.select(F.explode(F.array("v1", "v2", "v3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri"))
    )
    return per


def triangle_summary(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges_und, n_wedges, n_triangles,
    global_cc_q9) with the transitivity ratio 3T / #wedges (#wedges =
    Σ C(deg, 2)), q9-quantized — the clustering-coefficient audit a
    crawl graph gets before link-analysis runs."""
    und = undirected_simple(edges).persist()
    deg = (
        und.select(F.col("a").alias("node")).unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2)).cast("long").alias("n_wedges"),
    )
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges_und"))
    nt = triangle_counts(edges).agg(
        F.coalesce(F.sum("tri") / F.lit(3), F.lit(0)).cast("long").alias("n_triangles")
    )
    out = base.crossJoin(ne).crossJoin(nt)
    cc = F.when(
        F.col("n_wedges") > 0,
        F.floor(
            (F.lit(3.0) * F.col("n_triangles").cast("double"))
            / F.col("n_wedges").cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return out.select("n_nodes", "n_edges_und", "n_wedges", "n_triangles", cc.alias("global_cc_q9"))


def local_clustering(edges: DataFrame) -> DataFrame:
    """Per-node (node, deg, tri, cc_q9): local clustering coefficient
    2·tri / (deg·(deg-1)) (Watts & Strogatz 1998), q9-quantized; nodes
    of degree < 2 score 0."""
    und = undirected_simple(edges)
    deg = (
        und.select(F.col("a").alias("node")).unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    per = triangle_counts(edges)
    j = deg.join(per, "node", "left").select(
        "node", "deg", F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri")
    )
    cc = F.when(
        F.col("deg") >= 2,
        F.floor(
            (F.lit(2.0) * F.col("tri").cast("double"))
            / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return j.select("node", "deg", "tri", cc.alias("cc_q9"))


def cocitation_pairs(edges: DataFrame, min_count: int = 1) -> DataFrame:
    """Co-citation similarity (Small, "Co-citation in the scientific
    literature", JASIS 1973): pages (a < b) are related when the same
    sources link to both — cocite(a,b) = |{s : s->a and s->b}|.
    Self-join of the deduped edge list on src; the classic related-
    pages signal on a web graph (Dean & Henzinger WWW'99 use exactly
    this).  Returns (a, b, n_common) with n_common >= min_count.

    Skew: a source with out-degree d emits C(d,2) pairs — on a real
    crawl cap hub out-degrees before the self-join (the anchor-agg
    hub-cap discipline); the synthetic graph's max out-degree is 3.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    e = edges.select("src", "dst").distinct()
    e2 = e.select(F.col("src").alias("src"), F.col("dst").alias("dst2"))
    pairs = e.join(e2, "src").filter(F.col("dst") < F.col("dst2"))
    return (
        pairs.groupBy(F.col("dst").alias("a"), F.col("dst2").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_count)
    )


def bibliographic_coupling(edges: DataFrame, min_count: int = 1) -> DataFrame:
    """Bibliographic coupling (Kessler, "Bibliographic coupling between
    scientific papers", American Documentation 1963): sources (a < b)
    are related when they link to the same targets — couple(a,b) =
    |{t : a->t and b->t}|.  The out-link dual of co-citation: the same
    self-join shape keyed on dst.  Returns (a, b, n_shared) with
    n_shared >= min_count; the skew cap here is target IN-degree.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    e = edges.select("src", "dst").distinct()
    e2 = e.select(F.col("src").alias("src2"), F.col("dst").alias("dst"))
    pairs = e.join(e2, "dst").filter(F.col("src") < F.col("src2"))
    return (
        pairs.groupBy(F.col("src").alias("a"), F.col("src2").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_count)
    )


def kcore_peel(edges: DataFrame, k: int = 2, rounds: int = 4) -> DataFrame:
    """Fixed-round k-core peeling (Seidman, "Network structure and
    minimum degree", Social Networks 1983; the distributed
    one-round-per-superstep peel of Montresor et al., "Distributed
    k-core decomposition", IEEE TPDS 2013): each round drops every
    node whose degree in the SURVIVING subgraph is < k.  Returns one
    row per round: (round, n_remaining) — monotone nonincreasing; when
    two consecutive rounds agree the set is exactly the k-core.  Fixed
    ``rounds`` (not run-to-convergence) keeps the plan a finite CTE
    chain the SQL oracle unrolls identically.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    _KCORE_SCOPE.begin()
    und = _KCORE_SCOPE.track(undirected_simple(edges))
    cur = und
    out = None
    for r in range(1, rounds + 1):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = _KCORE_SCOPE.track(deg.filter(F.col("deg") >= k).select("node"))
        cur = _KCORE_SCOPE.track(
            cur.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
        )
        row = keep.agg(F.count(F.lit(1)).cast("long").alias("n_remaining")).select(
            F.lit(r).cast("long").alias("round"), "n_remaining"
        )
        out = row if out is None else out.unionByName(row)
    return out


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, "Assortative mixing in
    networks", PRL 2002) of the undirected simple graph: do high-degree
    nodes link to high-degree nodes?  Computed from INTEGER moments
    over the 2|E| directed stubs (Sjk = Σ j·k, S1 = Σ j, S2 = Σ j²),

        r = (M·Sjk - S1²) / (M·S2 - S1²),   M = 2|E|

    so the only floating-point op is the final division — one row
    (m_stubs, s1, s2, sjk, r_q9); r_q9 = -10^9..10^9.  Web graphs are
    famously DISassortative (r < 0) — a property worth auditing before
    trusting hub-based heuristics.
    """
    und = undirected_simple(edges)
    deg = (
        und.select(F.col("a").alias("node")).unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    stubs = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    j = (
        stubs.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("ju")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("jv")), "v")
    )
    mo = j.agg(
        F.count(F.lit(1)).cast("long").alias("m_stubs"),
        F.sum("ju").cast("long").alias("s1"),
        F.sum(F.col("ju") * F.col("ju")).cast("long").alias("s2"),
        F.sum(F.col("ju") * F.col("jv")).cast("long").alias("sjk"),
    )
    num = (F.col("m_stubs") * F.col("sjk") - F.col("s1") * F.col("s1")).cast("double")
    den = (F.col("m_stubs") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    r_q9 = F.when(
        den != 0.0, F.floor(num / den * F.lit(1e9) + F.lit(0.5)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return mo.select("m_stubs", "s1", "s2", "sjk", r_q9.alias("r_q9"))


def bfs_distances(
    edges: DataFrame, source: int = 0, max_hops: int = 6
) -> DataFrame:
    """Fixed-round BFS over the directed edge list: (node, dist) for
    every node reachable from ``source`` within ``max_hops`` — the
    bulk-synchronous frontier expansion every Pregel-style engine runs
    (one join + min-aggregate per round; the bound makes the plan a
    finite chain the SQL oracle unrolls identically).  Distances are
    exact smallest hop counts within the bound.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    _BFS_SCOPE.begin()
    e = _BFS_SCOPE.track(edges.select("src", "dst").distinct())
    spark = edges.sparkSession
    dist = spark.createDataFrame([(int(source), 0)], "node long, dist long")
    for r in range(1, max_hops + 1):
        nxt = (
            e.join(dist.select(F.col("node").alias("src"), "dist"), "src")
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = _BFS_SCOPE.track(
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist


def harmonic_centrality_seed(
    edges: DataFrame, source: int = 0, max_hops: int = 6
) -> DataFrame:
    """Bounded harmonic centrality of ``source`` (Boldi & Vigna,
    "Axioms for centrality", Internet Mathematics 2014: H(v) =
    Σ_{u != v} 1/d(v, u), the centrality that handles disconnected
    graphs gracefully): per-node contributions floor(1e9/d) are exact
    integers (d is a small hop count), so the sum is engine-stable.
    One row: (n_reached, harmonic_q9_sum) over nodes within max_hops,
    source excluded.
    """
    d = bfs_distances(edges, source=source, max_hops=max_hops).filter(
        F.col("dist") > 0
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum(F.floor(F.lit(1_000_000_000) / F.col("dist"))).cast("long").alias(
            "harmonic_q9_sum"
        ),
    )


def simrank_pairs(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 2,
) -> DataFrame:
    """SimRank structural similarity (Jeh & Widom, "SimRank: A Measure
    of Structural-Context Similarity", KDD'02) with C = 4/5, run for a
    bounded number of iterations ENTIRELY in exact integer arithmetic:

        s_{t+1}(a,b) = C / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} s_t(i,j)

    Scores are kept q9-quantized BIGINTs; because C = 4/5 is rational,
    each iteration is one integer rounding
    ((8*X + 5*D) DIV (10*D) for X = summed q9 mass, D = |I(a)||I(b)|)
    — no ln, no float, so any engine replays it bit-for-bit.  In-
    neighbor multisets keep edge multiplicity (the multigraph semantics
    of build_link_graph).

    Iteration 1 reduces to co-citation (only the diagonal s_0 feeds the
    sum); iteration t touches only pairs whose in-neighbors connect
    through the SPARSE support of s_{t-1} — the standard SimRank
    sparsity, so the pair frame grows with the graph's similarity
    structure, never materializing N^2.  Returns (a, b, s_q9) for a < b
    with s_q9 > 0.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    inn = (
        edges.groupBy(F.col("dst").alias("v"), F.col("src").alias("i"))
        .agg(F.count("*").cast("long").alias("m"))
    )
    indeg = inn.groupBy("v").agg(F.sum("m").cast("long").alias("d"))
    Q9 = 10**9

    # symmetric nonzero score table, diagonal implicit: rows (i, j, s) i<j
    s_prev: DataFrame | None = None  # None = s_0 (diagonal only)
    for _ in range(iterations):
        ia = inn.select(F.col("v").alias("a"), F.col("i").alias("ia"), F.col("m").alias("ma"))
        ib = inn.select(F.col("v").alias("b"), F.col("i").alias("ib"), F.col("m").alias("mb"))
        if s_prev is None:
            # s_0(i,j) = Q9 iff i == j
            mass = (
                ia.join(ib, ia["ia"] == ib["ib"])
                .filter(F.col("a") < F.col("b"))
                .groupBy("a", "b")
                .agg(F.sum(F.col("ma") * F.col("mb") * F.lit(Q9)).cast("long").alias("x"))
            )
        else:
            sym = s_prev.select("i", "j", "s").unionByName(
                s_prev.select(F.col("j").alias("i"), F.col("i").alias("j"), "s")
            ).unionByName(
                inn.select(F.col("i"), F.col("i").alias("j"), F.lit(Q9).cast("long").alias("s")).distinct()
            )
            mass = (
                ia.join(sym, ia["ia"] == sym["i"])
                .join(ib, sym["j"] == ib["ib"])
                .filter(F.col("a") < F.col("b"))
                .groupBy("a", "b")
                .agg(F.sum(F.col("ma") * F.col("s") * F.col("mb")).cast("long").alias("x"))
            )
        da = indeg.select(F.col("v").alias("a"), F.col("d").alias("da"))
        db = indeg.select(F.col("v").alias("b"), F.col("d").alias("db"))
        s_prev = (
            mass.join(da, "a")
            .join(db, "b")
            .select(
                F.col("a").alias("i"),
                F.col("b").alias("j"),
                F.expr("(8 * x + 5 * da * db) DIV (10 * da * db)").cast("long").alias("s"),
            )
            .filter(F.col("s") > 0)
        )
    return s_prev.select(F.col("i").alias("a"), F.col("j").alias("b"), F.col("s").alias("s_q9"))
