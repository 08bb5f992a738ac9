"""Round-5 part-u twins: anchor-text aggregation, set-based MLT
interesting terms, and Zipf vocabulary statistics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.functions.anchors import anchor_text_agg, build_anchor_edges
from lucenenet_spark.functions.pagerank import KNUTH, STRIDE
from lucenenet_spark.functions.textstats import zipf_vocab_stats
from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.mlt import interesting_terms, more_like_this_query
from lucenenet_spark.search.queries import TermQuery


# ---------------------------------------------------------------- anchors
def _expected_edges(texts: list[str]) -> list[tuple[int, int, str]]:
    """Pure-Python replica of build_anchor_edges for a dense-id corpus."""
    n = len(texts)
    out = []
    for src, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        for j in range(src % 3 + 1):
            t = ((src % n) * KNUTH + STRIDE * (j + 1)) % n
            dst = (t + 1) % n if t == src else t
            anchor = " ".join(toks[j : j + 3])
            out.append((src, dst, anchor))
    return out


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_anchor_edges_match_python_replica(spark):
    texts = [f"w{i} x{i} y{i} z{i} q{i} r{i}" for i in range(17)]
    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in build_anchor_edges(_mk_docs(spark, texts)).collect()
    )
    assert got == sorted(_expected_edges(texts))


def test_anchor_short_doc_truncates_like_real_anchors(spark):
    # doc 2 emits edges j=0..2 but has only 2 tokens: anchors shrink,
    # never NULL (concat_ws drops missing slots).
    texts = ["a b c d", "e f g h", "p q"]
    rows = build_anchor_edges(_mk_docs(spark, texts)).filter(F.col("src") == 2).collect()
    anchors = sorted(r["anchor"] for r in rows)
    assert anchors == ["", "p q", "q"]  # j=0 -> 'p q', j=1 -> 'q', j=2 -> ''


def test_anchor_agg_counts_and_sorted_distinct_cat(spark):
    texts = [f"t{i} u{i} v{i} w{i}" for i in range(11)]
    edges = _expected_edges(texts)
    agg = {
        r["dst"]: (r["n_anchors"], r["n_src"], r["anchors_cat"])
        for r in anchor_text_agg(build_anchor_edges(_mk_docs(spark, texts)), k=100).collect()
    }
    by_dst: dict[int, list[tuple[int, str]]] = {}
    for s, d, a in edges:
        by_dst.setdefault(d, []).append((s, a))
    assert set(agg) == set(by_dst)
    for d, pairs in by_dst.items():
        n_anchors, n_src, cat = agg[d]
        assert n_anchors == len(pairs)
        assert n_src == len({s for s, _ in pairs})
        assert cat == "|".join(sorted({a for _, a in pairs}))


def test_anchor_agg_cap_bounds_hub_state(spark):
    # All edges onto one dst with distinct anchors: cap keeps 2 smallest.
    edges = spark.createDataFrame(
        [(i, 0, f"anchor{i:02d}") for i in range(10)], "src long, dst long, anchor string"
    )
    row = anchor_text_agg(edges, k=1, max_anchors=2).collect()[0]
    assert row["n_anchors"] == 10 and row["n_src"] == 10
    assert row["anchors_cat"] == "anchor00|anchor01"


# ---------------------------------------------------- MLT interesting terms
@pytest.fixture(scope="module")
def small_index(spark):
    texts = [
        "spark index spark index merge merge merge query",
        "query plan query plan filter filter scan scan scan",
        "index scan filter merge query spark plan batch batch",
        "batch row batch row window window window agg agg",
    ] * 4  # df high enough for min_doc_freq gates
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return build_index(docs, text_col="text", id_col="doc_id")


def test_interesting_terms_match_mlt_query_clauses(small_index):
    """The set-based surface must select exactly the terms the existing
    one-doc MLT query builder selects (same gates, same quantized
    ranking), for every seed doc."""
    df = interesting_terms(
        small_index, max_doc_id=4, per_doc=25, min_term_freq=2, min_doc_freq=2
    )
    by_doc: dict[int, list[str]] = {}
    for r in df.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["term"]))
    for d in range(4):
        q = more_like_this_query(
            small_index, d, max_query_terms=25, min_term_freq=2, min_doc_freq=2
        )
        want = [c.query.term for c in q.clauses if isinstance(c.query, TermQuery)]
        got = [t for _, t in sorted(by_doc.get(d, []))]
        assert got == want, f"doc {d}: {got} != {want}"


def test_interesting_terms_respects_gates_and_k(small_index):
    df = interesting_terms(
        small_index, max_doc_id=2, per_doc=2, min_term_freq=3, min_doc_freq=1
    ).collect()
    assert {r["doc_id"] for r in df} <= {0, 1}
    for r in df:
        assert r["rnk"] <= 2
    # min_term_freq=3 keeps only tf>=3 terms of doc 0: 'merge' (tf 3)
    doc0 = [r["term"] for r in df if r["doc_id"] == 0]
    assert doc0 == ["merge"]


# ------------------------------------------------------------------- zipf
def _zipf_expected(freqs: dict[str, int]) -> tuple[int, int, int, int]:
    """Pure-Python replica of the quantize-then-integer-sum regression."""
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(i + 1) * 1e6 + 0.5) for i in range(len(ranked))]
    ys = [math.floor(math.log(c) * 1e6 + 0.5) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / (
        float(n) * float(sxx) - float(sx) * float(sx)
    )
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return (
        n,
        sum(freqs.values()),
        math.floor(slope * 1e6 + 0.5),
        math.floor(intercept + 0.5),
    )


def test_zipf_stats_match_python_replica(spark):
    freqs = {f"term{i:03d}": max(1, 1000 // (i + 1)) for i in range(40)}
    ts = spark.createDataFrame(list(freqs.items()), "term string, ttf long")
    row = zipf_vocab_stats(ts).collect()[0]
    n, tot, slope_q, intercept_q = _zipf_expected(freqs)
    assert (row["n_terms"], row["total_tokens"]) == (n, tot)
    assert row["slope_q"] == slope_q
    assert row["intercept_q"] == intercept_q
    # an exact-Zipf vocabulary fits slope ~= -1
    assert -1_100_000 < row["slope_q"] < -900_000


def test_zipf_tie_break_is_term_ascending(spark):
    # equal frequencies: rank order must be term ASC, making the result
    # deterministic — replica agreement proves the tie-break matches.
    freqs = {w: 7 for w in ("b", "a", "d", "c")}
    freqs["z"] = 100
    ts = spark.createDataFrame(list(freqs.items()), "term string, ttf long")
    row = zipf_vocab_stats(ts).collect()[0]
    n, tot, slope_q, intercept_q = _zipf_expected(freqs)
    assert (row["n_terms"], row["total_tokens"], row["slope_q"], row["intercept_q"]) == (
        n,
        tot,
        slope_q,
        intercept_q,
    )


# ------------------------------------------------------- anchor field search
def test_anchor_field_search_scores_anchor_not_body(spark):
    """A term present only in SOURCE texts (hence in anchors) must hit
    the TARGETS it links to via the anchor field, and a target's own
    body text must contribute nothing."""
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    # doc 0 starts with the marker tokens; its j=0 anchor lands on some dst
    texts = ["zzmarker aa bb cc dd"] + [f"p{i} q{i} r{i} s{i} t{i}" for i in range(1, 9)]
    docs = _mk_docs(spark, texts)
    edges = build_anchor_edges(docs)
    marker_dsts = {r["dst"] for r in edges.filter(F.col("anchor").contains("zzmarker")).collect()}
    assert marker_dsts  # the synthetic graph always emits >= 1 edge per src

    adoc = edges.groupBy("dst").agg(
        F.array_join(F.array_sort(F.collect_list("anchor")), " ").alias("atext")
    )
    docs2 = (
        docs.select("doc_id")
        .join(adoc, docs["doc_id"] == adoc["dst"], "left")
        .select("doc_id", F.coalesce(F.col("atext"), F.lit("")).alias("text"))
    )
    idx = build_index(docs2, text_col="text", id_col="doc_id")
    hits = {
        r["doc_id"]
        for r in IndexSearcher(idx, mode="double").scored(TermQuery("zzmarker")).collect()
    }
    assert hits == marker_dsts
    # doc 0's own body contains zzmarker, but unless an edge carried it
    # there, doc 0 itself must NOT match on the anchor field
    if 0 not in marker_dsts:
        assert 0 not in hits


# --------------------------------------------------------- static rank blend
def test_static_rank_blend_prior_breaks_bm25_ties(spark):
    """Identical texts => identical BM25; the PageRank prior must then
    decide the order, and the blend must equal bm25 + 0.3*ln(1+pr_q)
    recomputed from the component outputs."""
    import math

    from lucenenet_spark.functions.pagerank import build_link_graph, pagerank
    from lucenenet_spark.search.searcher import IndexSearcher

    texts = ["alpha beta gamma delta"] * 12
    docs = _mk_docs(spark, texts)
    idx = build_index(docs, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    bm25 = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("alpha")).collect()}
    assert len(set(round(v, 9) for v in bm25.values())) == 1  # all tied

    nodes = docs.select("doc_id")
    pr = pagerank(nodes, build_link_graph(nodes), damping=0.85, iterations=5)
    pr_q = {r["doc_id"]: math.floor(r["pr"] * 1e7 + 0.5) for r in pr.collect()}

    blended = {
        d: math.floor((bm25[d] + 0.3 * math.log(1 + pr_q[d])) * 10000 + 0.5)
        for d in bm25
    }
    want = sorted(bm25, key=lambda d: (-blended[d], d))
    # equal-BM25 docs must now be ordered by prior (desc), doc_id tiebreak
    by_prior = sorted(bm25, key=lambda d: (-pr_q[d], d))
    # wherever priors are strictly ordered, blend order must agree
    assert want == by_prior


# --------------------------------------------------------- link graph stats
def test_graph_stats_hand_built(spark):
    """Hand graph: 1<->2 reciprocal, 0->1, 3->3 self-loop, dup edge 0->1."""
    from lucenenet_spark.functions.pagerank import graph_stats

    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2), (2, 1), (3, 3)], "src long, dst long"
    )
    r = graph_stats(edges).collect()[0]
    assert r["n_edges"] == 5
    assert r["n_distinct_edges"] == 4
    assert r["n_src_nodes"] == 4 and r["n_dst_nodes"] == 3
    assert r["self_loops"] == 1
    assert r["max_out_degree"] == 1  # distinct edges: 0->1,1->2,2->1,3->3
    assert r["max_in_degree"] == 2  # dst 1 from {0,2}
    assert r["reciprocal_pairs"] == 1  # {1,2}


# --------------------------------------------------------- host collapse
def test_host_collapse_caps_per_host_and_backfills(spark):
    """One host owning the best scores may place at most 2 results; the
    rest of the page backfills from other hosts in score order."""
    from pyspark.sql import Window

    # synthetic scored rows: host A has the 4 best scores
    rows = [(i, 100 - i, "A" if i < 4 else f"H{i}") for i in range(10)]
    scored = spark.createDataFrame(rows, "doc_id long, score_q long, source string")
    w = Window.partitionBy("source").orderBy(F.desc("score_q"), F.asc("doc_id"))
    out = (
        scored.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= 2)
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(5)
        .collect()
    )
    got = [(r["doc_id"], r["source"]) for r in out]
    # doc 0,1 from A (capped), then docs 4,5,6 from distinct hosts
    assert got == [(0, "A"), (1, "A"), (4, "H4"), (5, "H5"), (6, "H6")]
    from collections import Counter

    assert max(Counter(s for _, s in got).values()) <= 2


# ------------------------------------------------------ sparse cosine pairs
def test_sparse_cosine_pairs_exact_on_hand_corpus(spark):
    """Two identical docs must hit cos_q = 1e6; disjoint docs never pair;
    the df cap drops a ubiquitous term from all vectors."""
    import math

    from lucenenet_spark.functions.similarity import sparse_cosine_pairs

    texts = [
        "apple banana cherry stopterm",
        "apple banana cherry stopterm",   # identical to doc 0
        "apple banana date stopterm",     # shares 2 of 3 informative terms
        "elephant fox grape stopterm",    # disjoint informative terms
    ]
    docs = _mk_docs(spark, texts)
    idx = build_index(docs, text_col="text", id_col="doc_id")
    # df cap 3 excludes 'stopterm' (df 4), keeps everything else
    out = sparse_cosine_pairs(
        idx.postings, idx.term_stats, idx.max_doc, df_cap=3, k=10,
        field=idx.default_field,
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["cos_q"] for r in out}
    assert got[(0, 1)] == 1_000_000  # identical vectors
    assert (0, 3) not in got and (1, 3) not in got and (2, 3) not in got
    # replicate (0,2) by hand: terms apple/banana shared, cherry/date not
    n = 4
    wq = {}
    for t, df in (("apple", 3), ("banana", 3), ("cherry", 2), ("date", 1)):
        wq[t] = math.floor(1 * (math.log(n / (df + 1)) + 1) * 1000 + 0.5)
    dot = wq["apple"] ** 2 + wq["banana"] ** 2
    na2 = wq["apple"] ** 2 + wq["banana"] ** 2 + wq["cherry"] ** 2
    nb2 = wq["apple"] ** 2 + wq["banana"] ** 2 + wq["date"] ** 2
    want = math.floor(dot / (math.sqrt(na2) * math.sqrt(nb2)) * 1e6 + 0.5)
    assert got[(0, 2)] == want


# ---------------------------------------------------------- proximity boost
def test_min_pair_distance_and_bonus_ordering(spark):
    """Hand corpus: equal BM25 contributions, proximity decides."""
    from lucenenet_spark.search.proximity import min_pair_distance, proximity_boost_topk
    from lucenenet_spark.search.searcher import IndexSearcher

    texts = [
        "aa bb x x x x",   # dist 1
        "aa x x bb x x",   # dist 3
        "aa x x x x bb",   # dist 5
        "aa x x x x x",    # no bb -> excluded (conjunctive)
    ]
    docs = _mk_docs(spark, texts)
    idx = build_index(docs, text_col="text", id_col="doc_id")
    md = {r["doc_id"]: r["mindist"] for r in min_pair_distance(idx, "aa", "bb").collect()}
    assert md == {0: 1, 1: 3, 2: 5}
    out = proximity_boost_topk(IndexSearcher(idx, mode="double"), "aa", "bb", k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # same tf/dl => bonus decides
    assert 3 not in {r["doc_id"] for r in out}


def test_min_pair_distance_repeated_positions(spark):
    # bb appears twice; min over all pairs
    texts = ["bb x x aa x bb"]
    idx = build_index(_mk_docs(spark, texts), text_col="text", id_col="doc_id")
    from lucenenet_spark.search.proximity import min_pair_distance

    md = min_pair_distance(idx, "aa", "bb").collect()
    assert md[0]["mindist"] == 2  # aa@3 vs bb@5


# ------------------------------------------------------------ collocations
def test_pmi_collocations_hand_counts(spark):
    """'new york' always adjacent => highest PMI; replica-checked."""
    import math

    from lucenenet_spark.functions.textstats import pmi_collocations

    texts = ["new york " * 5 + "cat", "dog new york fish new york", "cat dog fish " * 4]
    docs = _mk_docs(spark, texts)
    out = pmi_collocations(docs, min_count=2, k=5).collect()
    # full Python replica: counts, PMI, quantization, ordering
    toks = [[t for t in x.split(" ") if t] for x in texts]
    flat = [w for ts in toks for w in ts]
    bigs = [(ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)]
    T, B = len(flat), len(bigs)
    from collections import Counter

    cu, cb2 = Counter(flat), Counter(bigs)
    want = []
    for (a, b), cab in cb2.items():
        if cab >= 2:
            pmi_q = math.floor(
                math.log((cab / B) / ((cu[a] / T) * (cu[b] / T))) * 1e6 + 0.5
            )
            want.append((a, b, cab, pmi_q))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    got = [(r["w1"], r["w2"], r["cb"], r["pmi_q"]) for r in out]
    assert got == want[:5]
    assert ("new", "york") in {(a, b) for a, b, _, _ in want}  # survives the gate
    # min_count gate: raising it above every bigram count empties the result
    max_cb = max(cb2.values())
    assert pmi_collocations(docs, min_count=max_cb + 1, k=5).count() == 0


# ------------------------------------------------------------------- BM25F
def test_bm25f_single_saturation_beats_per_field_sum(spark):
    """BM25F's defining property: a doc matching BOTH fields weakly is
    NOT scored like two independent BM25 saturations. Verified on a
    hand corpus against a pure-Python replica."""
    import math

    from lucenenet_spark.search.bm25f import bm25f_topk

    texts_body = ["q x x x", "q q q q", "x x x x"]
    texts_anchor = ["q y", "", "q q y y"]
    docs = spark.createDataFrame(
        list(zip(range(3), texts_body, texts_anchor)),
        "doc_id long, body string, anchor string",
    )
    idx = build_index(docs, text_col="body", id_col="doc_id", fields=["body", "anchor"])
    out = {
        r["doc_id"]: r["score_q"]
        for r in bm25f_topk(idx, "q", {"body": 1.0, "anchor": 2.0}, k=10).collect()
    }

    # replica
    n = 3.0
    body_toks = [t.split() for t in texts_body]
    anc_toks = [t.split() if t else [] for t in texts_anchor]
    sttf_b = sum(len(t) for t in body_toks)
    sttf_a = sum(len(t) for t in anc_toks)
    df = float(len({d for d in range(3) if "q" in body_toks[d] or "q" in anc_toks[d]}))
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    want = {}
    for d in range(3):
        tfn = 0.0
        tfb = body_toks[d].count("q")
        if tfb:
            tfn += 1.0 * tfb / (0.25 + 0.75 * len(body_toks[d]) / (sttf_b / n))
        tfa = anc_toks[d].count("q")
        if tfa:
            tfn += 2.0 * tfa / (0.25 + 0.75 * len(anc_toks[d]) / (sttf_a / n))
        if tfn:
            want[d] = math.floor(idf * tfn / (1.2 + tfn) * 10000 + 0.5)
    assert out == want
    # saturation check: doc 1 (tf=4 in one field) must NOT dominate by 4x
    assert out[1] < 4 * out[0]


# ----------------------------------------------------------- nDCG / clarity
def test_ndcg_perfect_ranking_is_one(spark):
    """If BM25 order coincides with grade order, nDCG@k = 1."""
    from lucenenet_spark.search.quality import ndcg_at_k
    from lucenenet_spark.search.searcher import IndexSearcher

    # tf gradient: higher tf => higher BM25 (equal dl) => ideal == run
    texts = [
        "q q q q x x",
        "q q q x x x",
        "q q x x x x",
        "q x x x x x",
    ]
    idx = build_index(_mk_docs(spark, texts), text_col="text", id_col="doc_id")
    row = ndcg_at_k(IndexSearcher(idx, mode="double"), "q", k=4).collect()[0]
    assert row["dcg_q9"] == row["idcg_q9"]
    assert row["ndcg_q"] == 1_000_000


def test_ndcg_replica_with_imperfect_ranking(spark):
    """Longer doc with equal tf ranks lower in BM25 but equal in grade:
    replica-check the exact quantized DCG/IDCG."""
    import math

    from lucenenet_spark.search.quality import ndcg_at_k
    from lucenenet_spark.search.searcher import IndexSearcher

    # doc 0: highest grade (tf 3) but diluted in a long doc so BM25
    # ranks the short tf-2 doc above it -> a GRADED inversion nDCG sees
    texts = [
        "q q q " + "x " * 40,
        "q q x",
        "q x x",
    ]
    idx = build_index(_mk_docs(spark, texts), text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    row = ndcg_at_k(s, "q", k=3, max_grade=4).collect()[0]
    # replica: compute run/ideal orders from engine scores + grades
    scores = {
        r["doc_id"]: math.floor(r["score"] * 10000 + 0.5)
        for r in s.scored(TermQuery("q")).collect()
    }
    grades = {0: 3, 1: 2, 2: 1}
    assert scores[1] > scores[0]  # the inversion BM25 makes
    run = sorted(scores, key=lambda d: (-scores[d], d))[:3]
    ideal = sorted(grades, key=lambda d: (-grades[d], d))[:3]

    def cq(g, r):
        return math.floor((2.0 ** g - 1.0) / (math.log(r + 1.0) / math.log(2.0)) * 1e9 + 0.5)

    dcg = sum(cq(grades[d], i + 1) for i, d in enumerate(run))
    idcg = sum(cq(grades[d], i + 1) for i, d in enumerate(ideal))
    assert (row["dcg_q9"], row["idcg_q9"]) == (dcg, idcg)
    assert row["ndcg_q"] == math.floor(dcg / idcg * 1e6 + 0.5)
    assert row["ndcg_q"] < 1_000_000  # ranking is demonstrably imperfect


def test_query_clarity_focused_beats_diffuse(spark):
    """A result set whose language differs from the collection scores
    higher clarity than one that mirrors the collection."""
    from lucenenet_spark.search.quality import query_clarity
    from lucenenet_spark.search.searcher import IndexSearcher

    # 'rare' docs share a private vocabulary; 'common' docs mirror the corpus
    texts = (["rare zeta eta theta"] * 3) + (["common alpha beta gamma"] * 30)
    idx = build_index(_mk_docs(spark, texts), text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    rare = query_clarity(s, "zeta", k=3).collect()[0]
    common = query_clarity(s, "alpha", k=30).collect()[0]
    assert rare["clarity_q9"] > common["clarity_q9"]
    assert common["clarity_q9"] >= 0  # KL >= 0 up to quantization


# --------------------------------------------------------------------- RBO
def test_rbo_identical_and_disjoint_rankings(spark):
    import math

    from lucenenet_spark.search.quality import rbo_overlap

    k, p = 10, 0.9
    a = spark.createDataFrame(
        [(i, i + 1) for i in range(k)], "doc_id long, rank long"
    )
    ident = rbo_overlap(a, a, k=k, p=p).collect()[0]
    # identical rankings: overlap at depth d is d -> contribution (1-p)p^(d-1)
    want = sum(
        math.floor((1 - p) * p ** (d - 1) * 1.0 * 1e9 + 0.5) for d in range(1, k + 1)
    )
    assert ident["rbo_q9"] == want
    b = spark.createDataFrame(
        [(100 + i, i + 1) for i in range(k)], "doc_id long, rank long"
    )
    disjoint = rbo_overlap(a, b, k=k, p=p).collect()[0]
    assert disjoint["rbo_q9"] == 0


def test_rbo_partial_overlap_replica(spark):
    import math

    from lucenenet_spark.search.quality import rbo_overlap

    k, p = 5, 0.9
    # A: docs 0..4 ; B: docs 2,3,4 at top then 90,91
    a = spark.createDataFrame([(i, i + 1) for i in range(5)], "doc_id long, rank long")
    b = spark.createDataFrame(
        [(2, 1), (3, 2), (4, 3), (90, 4), (91, 5)], "doc_id long, rank long"
    )
    got = rbo_overlap(a, b, k=k, p=p).collect()[0]["rbo_q9"]
    ra = {i: i + 1 for i in range(5)}
    rb = {2: 1, 3: 2, 4: 3, 90: 4, 91: 5}
    want = 0
    for d in range(1, k + 1):
        ov = sum(1 for x in ra if x in rb and ra[x] <= d and rb[x] <= d)
        want += math.floor((1 - p) * p ** (d - 1) * (ov / d) * 1e9 + 0.5)
    assert got == want


# ------------------------------------------------------------- robots.txt
def test_robots_longest_match_and_tie_semantics(spark):
    """RFC 9309: longest prefix wins; allow beats disallow on equal
    length; no rule => allowed."""
    from lucenenet_spark.sources.robots import robots_filter

    urls = spark.createDataFrame(
        [
            (0, "h", "/private/ok/page0"),   # allow overrides /private
            (1, "h", "/private/page1"),      # disallowed
            (2, "h", "/public/page2"),       # no rule -> default allow
            (3, "h", "/dup/page3"),          # equal-length allow+disallow -> allow
        ],
        "doc_id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("h", "/private", False),
            ("h", "/private/ok", True),
            ("h", "/dup", False),
            ("h", "/dup", True),
        ],
        "host string, path_prefix string, allow boolean",
    )
    got = {r["doc_id"]: (r["allowed"], r["matched_prefix"]) for r in robots_filter(urls, rules).collect()}
    assert got == {
        0: (True, "/private/ok"),
        1: (False, "/private"),
        2: (True, ""),
        3: (True, "/dup"),
    }


# --------------------------------------------------------------- redirects
def test_redirect_chains_hops_and_loop_guard(spark):
    from lucenenet_spark.sources.robots import resolve_redirects

    urls = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # 0 -> 1 -> 2 (terminal); 3 -> 4 -> 3 (2-cycle); 5 no redirect
    redirects = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3)], "src long, target long"
    )
    got = {
        r["doc_id"]: (r["final_id"], r["hops"], r["terminal"])
        for r in resolve_redirects(urls, redirects, max_hops=3).collect()
    }
    assert got[0] == (2, 2, True)
    assert got[1] == (2, 1, True)
    assert got[2] == (2, 0, True)
    # the cycle burns the full budget and is flagged non-terminal
    assert got[3][1] == 3 and got[3][2] is False and got[3][0] in (3, 4)
    assert got[4][1] == 3 and got[4][2] is False
    assert got[5] == (5, 0, True)
