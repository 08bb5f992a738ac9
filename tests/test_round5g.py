"""Bonus-session operators: TOP_TERMS rewrite, span-near payload check,
SpanMultiTermQueryWrapper gate plumbing (gate_round5g)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur, PrefixQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.spans import (
    span_near_pattern_docs,
    span_near_payload_check_docs,
)


@pytest.fixture(scope="module")
def idx(corpus_df):
    return build_index(corpus_df, text_col="text", id_col="doc_id").cache()


def test_top_terms_rewrite_keeps_smallest_terms(idx):
    """Equal-boost ties keep the lexicographically SMALLEST matching terms
    (TopTermsRewrite.cs:272-283 reversed bytes comparison)."""
    s = IndexSearcher(idx, mode="double")
    bq = s.rewrite_top_terms(PrefixQuery("w00"), size=5)
    assert isinstance(bq, BooleanQuery)
    kept = [c.query.term for c in bq.clauses]
    assert len(kept) == 5
    assert all(c.occur == Occur.SHOULD for c in bq.clauses)
    # the kept set must be the 5 smallest 'w00*' terms in the dictionary
    all_terms = sorted(
        r["term"]
        for r in idx.term_stats.filter("term LIKE 'w00%'").select("term").collect()
    )
    assert kept == all_terms[:5]
    assert kept == sorted(kept)


def test_top_terms_rewrite_scores_match_manual_or(idx):
    """The rewritten query scores exactly like the equivalent hand-written
    SHOULD disjunction (TopTermsScoringBooleanQueryRewrite)."""
    s = IndexSearcher(idx, mode="double")
    bq = s.rewrite_top_terms(PrefixQuery("w00"), size=3)
    manual = BooleanQuery.of(
        *[(TermQuery(c.query.term), Occur.SHOULD) for c in bq.clauses]
    )
    got = {r["doc_id"]: r["score"] for r in s.scored(bq).collect()}
    want = {r["doc_id"]: r["score"] for r in s.scored(manual).collect()}
    assert got == want and got


def test_top_terms_size_bound_is_respected(idx):
    s = IndexSearcher(idx, mode="double")
    bq = s.rewrite_top_terms(PrefixQuery("w"), size=2)
    assert len(bq.clauses) == 2


def test_span_payload_check_matches_bruteforce(spark, corpus):
    """Payload-checked span-near vs a pure-Python oracle over the raw
    corpus, payloads = pos % 3 + 1 (the DelimitedPayload gate fixture)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer

    rows = [(d, t) for d, t in corpus.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fused = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, i: F.concat(
                    x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    t1, t2, slop, req = "w0001", "w0004", 2, [2.0, 1.0]
    got = {
        r["doc_id"]
        for r in span_near_payload_check_docs(idx, [t1, t2], req, slop=slop).collect()
    }
    want = set()
    for d, text in corpus.items():
        toks = [w for w in text.split(" ") if w]
        for i, a in enumerate(toks):
            if a != t1:
                continue
            for j in range(i + 1, min(i + slop + 2, len(toks))):
                if toks[j] != t2:
                    continue
                pla, plb = float(i % 3 + 1), float(j % 3 + 1)
                if pla in req and plb in req:
                    want.add(d)
    assert got == want


def test_span_payload_check_rejects_wrong_payloads(spark, corpus):
    """Required payload {3} only accepts spans whose BOTH positions are
    ≡2 (mod 3) — impossible for gap<3 spans closer than 3 apart unless
    both positions hit the residue; verify strictly fewer docs than the
    unchecked near."""
    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.search.spans import span_near_docs

    rows = [(d, t) for d, t in corpus.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fused = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, i: F.concat(
                    x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    unchecked = {
        r["doc_id"] for r in span_near_docs(idx, ["w0001", "w0002"], slop=4).collect()
    }
    checked = {
        r["doc_id"]
        for r in span_near_payload_check_docs(
            idx, ["w0001", "w0002"], [3.0, 3.0], slop=4
        ).collect()
    }
    assert checked <= unchecked
    assert len(checked) < len(unchecked)


def test_span_wrapper_near_vs_expanded_union(idx, corpus):
    """span_near_pattern_docs with a PrefixQuery slot equals the union of
    plain span_near_docs over every expanded term (the wrapper contract:
    SpanMultiTermQueryWrapper.cs rewrites to a SpanOr of matched terms)."""
    from lucenenet_spark.search.spans import span_near_docs

    pat = PrefixQuery("w000")
    got = {
        r["doc_id"]
        for r in span_near_pattern_docs(idx, ["w0012", pat], slop=3).collect()
    }
    expanded = [
        r["term"]
        for r in idx.term_stats.filter("term LIKE 'w000%'").select("term").collect()
    ]
    want = set()
    for t in expanded:
        if t == "w0012":
            continue  # span_near_docs self-join on the same term differs
        want |= {
            r["doc_id"] for r in span_near_docs(idx, ["w0012", t], slop=3).collect()
        }
    # the wrapper ALSO admits (w0012 .. w0012) pairs since w0012 matches
    # the pattern; reproduce that from the raw corpus
    for d, text in corpus.items():
        toks = [w for w in text.split(" ") if w]
        pos = [i for i, w in enumerate(toks) if w == "w0012"]
        if any(0 < b - a <= 4 for a in pos for b in pos):
            want.add(d)
    assert got == want


def test_scoring_rewrite_matches_manual_or(idx):
    """SCORING_BOOLEAN_QUERY_REWRITE (distributed, no driver term list)
    equals the hand-expanded SHOULD disjunction, doc for doc."""
    s = IndexSearcher(idx, mode="double")
    terms = [
        r["term"]
        for r in idx.term_stats.filter("term LIKE 'w00%'").select("term").collect()
    ]
    manual = BooleanQuery.of(*[(TermQuery(t), Occur.SHOULD) for t in terms])
    got = {r["doc_id"]: round(r["score"], 9) for r in s.scored_scoring_rewrite(PrefixQuery("w00")).collect()}
    want = {r["doc_id"]: round(r["score"], 9) for r in s.scored(manual).collect()}
    assert got == want and got


def test_auto_rewrite_filter_branch_constant_score(idx):
    """Default cutoffs: 0.1% of maxDoc is tiny, so a common prefix takes
    the filter branch; result = docset at constant score boost."""
    s = IndexSearcher(idx, mode="double")
    out = s.scored_auto_rewrite(PrefixQuery("w0"))
    rows = out.collect()
    assert rows and all(r["score"] == 1.0 for r in rows)
    want = {r["doc_id"] for r in s.docset(PrefixQuery("w0")).collect()}
    assert {r["doc_id"] for r in rows} == want


def test_auto_rewrite_boolean_branch_same_docset(idx):
    """Force the boolean (IN-list) branch with a permissive doc cutoff:
    both branches must return the identical constant-score docset
    (ConstantScoreAutoRewrite's two shapes are result-equivalent)."""
    s = IndexSearcher(idx, mode="double")
    filt = {r["doc_id"] for r in s.scored_auto_rewrite(PrefixQuery("w00")).collect()}
    boolean = {
        r["doc_id"]
        for r in s.scored_auto_rewrite(
            PrefixQuery("w00"), doc_count_percent=100.0
        ).collect()
    }
    assert boolean == filt and boolean


def test_to_child_block_join_no_forced_broadcast(spark):
    """to_child_block_join must work (and stay correct) when Spark cannot
    broadcast at all — the parent docset can be corpus-sized at scale."""
    from lucenenet_spark.search.joins import to_child_block_join

    parents = spark.createDataFrame([(1,), (3,)], "pk long")
    children = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "d")], "pk long, v string"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = to_child_block_join(parents, children, "pk")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" not in plan
        assert sorted((r["pk"], r["v"]) for r in out.collect()) == [
            (1, "a"), (3, "c"), (3, "d"),
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_span_payload_check_term_bruteforce(spark, corpus):
    """Single-clause SpanPayloadCheck over SpanFirst vs a raw-corpus
    oracle: term within first 5 positions AND pos % 3 + 1 == 1."""
    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.payloads import DelimitedPayloadAnalyzer
    from lucenenet_spark.search.spans import span_payload_check_term_docs

    rows = [(d, t) for d, t in corpus.items()]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fused = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda x, i: F.concat(
                    x, F.lit("|"), ((i % F.lit(3)) + F.lit(1)).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    idx = build_index(fused, analyzer=DelimitedPayloadAnalyzer())
    got = {
        r["doc_id"]
        for r in span_payload_check_term_docs(idx, "w0003", 1.0, end=5).collect()
    }
    want = {
        d
        for d, text in corpus.items()
        if any(
            w == "w0003" and i < 5 and i % 3 == 0
            for i, w in enumerate(x for x in text.split(" ") if x)
        )
    }
    assert got == want


def test_explain_components_multiply_to_score(idx):
    """Explanation invariant (BM25Similarity.ExplainScore): per row,
    score == boost(1) * idf * tf_norm, and the score column equals the
    scorer's own score for the same query."""
    from lucenenet_spark.search.queries import TermQuery

    s = IndexSearcher(idx, mode="double")
    ex = s.explain_term(TermQuery("w0002")).collect()
    assert ex
    for r in ex:
        assert abs(r["score"] - r["idf"] * r["tf_norm"]) < 1e-9
    scored = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("w0002")).collect()}
    for r in ex:
        assert abs(scored[r["doc_id"]] - r["score"]) < 1e-9
    assert set(scored) == {r["doc_id"] for r in ex}


def test_connected_components_chains_and_convergence(spark):
    """Chain A-B-C must land in ONE component (the pair-based failure
    mode), disjoint pairs stay separate, and a long path converges via
    min-label propagation within the iteration budget."""
    from lucenenet_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(100, 108)],
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert all(got[i] == 100 for i in range(100, 109))
    assert set(got) == {1, 2, 3, 10, 11, *range(100, 109)}


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check: random edge lists vs a pure-Python union-find
    oracle (deterministic seeds; components must match exactly)."""
    import random

    from lucenenet_spark.functions.dedup import connected_components

    for seed in (7, 19):
        rng = random.Random(seed)
        n, m = 60, 45
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes_in_edges = {x for e in edges for x in e}
        want = {x: find(x) for x in nodes_in_edges}
        # union-find roots are already component minima here because we
        # always attach the larger root under the smaller one
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert got == want, f"seed {seed}"
