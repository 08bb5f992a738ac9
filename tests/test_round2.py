"""Round-2 features: multi-field indexing, field: parser syntax,
MultiPhraseQuery, Damerau fuzzy (transpositions), de-toyed dedup/ANN
(df-cap, bucket cap, verify stage, multi-probe recall), sloppy-freq
closed form used by the gate oracle."""

import pytest

from lucenenet_spark import IndexSearcher, TermQuery, build_index
from lucenenet_spark.search.queries import (
    BooleanQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
)


@pytest.fixture(scope="module")
def mf(spark):
    rows = [
        (0, "apache spark engine", "alpha"),
        (1, "spark sql engine fast engine", "beta"),
        (2, "lucene index search", "alpha"),
        (3, "apache lucene net port", "beta gamma"),
        (4, "bear hunts in the forest", "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, title string")
    idx = build_index(df, fields=["text", "title"]).cache()
    return IndexSearcher(idx)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


# ------------------------------------------------------------- multi-field
def test_field_term_queries(mf):
    assert _ids(mf.docset(TermQuery("spark"))) == [0, 1]
    assert _ids(mf.docset(TermQuery("alpha", field="title"))) == [0, 2]
    # same token, different fields -> different postings
    assert _ids(mf.docset(TermQuery("gamma", field="title"))) == [3, 4]
    assert _ids(mf.docset(TermQuery("gamma"))) == []


def test_per_field_stats(mf):
    idx = mf.index
    assert idx.fields == ("text", "title")
    assert idx.max_doc == 5
    # text: 3+5+3+4+5 tokens ('in'/'the' are stopwords: 'bear hunts in the
    # forest' -> bear hunts forest = 3 emitted) -> recompute: doc4 text has
    # 5 raw tokens, 2 stopwords -> dl=3; total = 3+5+3+4+3 = 18
    assert idx.sum_ttf_by_field["text"] == 18
    assert idx.sum_ttf_by_field["title"] == 6
    assert idx.avgdl_for("title") != idx.avgdl_for("text")


def test_field_scoring_uses_field_avgdl(mf):
    # title:beta in doc1 (dl=1) vs doc3 (dl=2): doc1 scores higher
    rows = mf.search(TermQuery("beta", field="title"), 5).collect()
    assert [r["doc_id"] for r in rows] == [1, 3]
    assert rows[0]["score"] > rows[1]["score"]
    e = mf.explain("beta", 1, field="title")
    assert e is not None and e["dl"] == 1 and e["field"] == "title"


def test_parser_field_syntax(mf):
    assert _ids(mf.search_text("title:alpha", 10)) == [0, 2]
    assert _ids(mf.search_text("title:alpha AND engine", 10)) == [0]
    assert _ids(mf.search_text('title:"beta gamma"', 10)) == [3]
    # default field unchanged
    assert _ids(mf.search_text("spark", 10)) == [0, 1]


def test_cross_field_boolean(mf):
    q = BooleanQuery.of(
        (TermQuery("engine"), Occur.MUST),
        (TermQuery("alpha", field="title"), Occur.SHOULD),
    )
    rows = mf.search(q, 5).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1]
    # doc0 gets the title:alpha bonus
    by_id = {r["doc_id"]: r["score"] for r in rows}
    solo = {r["doc_id"]: r["score"] for r in mf.scored(TermQuery("engine")).collect()}
    assert by_id[0] > solo[0]
    assert abs(by_id[1] - solo[1]) < 1e-9


def test_save_load_roundtrip_multifield(mf, spark, tmp_path):
    from lucenenet_spark.index.builder import InvertedIndex

    path = str(tmp_path / "mfidx")
    mf.index.save(path)
    idx2 = InvertedIndex.load(spark, path)
    assert idx2.fields == ("text", "title")
    assert idx2.sum_ttf_by_field == mf.index.sum_ttf_by_field
    s2 = IndexSearcher(idx2)
    assert _ids(s2.docset(TermQuery("alpha", field="title"))) == [0, 2]


# ------------------------------------------------------------- multi-phrase
def test_multi_phrase(mf):
    # "apache (spark|lucene)" matches docs 0 and 3
    q = MultiPhraseQuery(term_arrays=(("apache",), ("spark", "lucene")))
    assert _ids(mf.scored(q)) == [0, 3]
    # singleton slots == plain phrase (MultiPhraseQuery.Rewrite)
    q1 = MultiPhraseQuery(term_arrays=(("apache",), ("spark",)))
    p1 = PhraseQuery(terms=("apache", "spark"))
    a = {(r["doc_id"], round(r["score"], 6)) for r in mf.scored(q1).collect()}
    # rewrite collapses to PhraseQuery, so scores are identical
    b = {(r["doc_id"], round(r["score"], 6)) for r in mf.scored(p1).collect()}
    assert a == b


# ------------------------------------------------------------- fuzzy/Damerau
def test_fuzzy_transpositions(spark):
    # reference default transpositions=true (FuzzyQuery.cs:61):
    # "baer"~1 must match "bear" (adjacent swap = ONE edit)
    docs = {0: "a bear in the woods", 1: "a beer on the table", 2: "bare hands"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    s = IndexSearcher(build_index(df))
    hits = _ids(s.docset(FuzzyQuery("baer", max_edits=1)))
    assert 0 in hits  # bear: transposition = 1 edit
    assert 1 in hits  # beer: substitution = 1 edit
    assert 2 in hits  # bare: transposition = 1 edit
    # with transpositions=False (plain Levenshtein), bear is 2 edits away
    hits_nt = _ids(s.docset(FuzzyQuery("baer", max_edits=1, transpositions=False)))
    assert 0 not in hits_nt and 1 in hits_nt


def test_osa_distance_primitives():
    from lucenenet_spark.search.searcher import _osa_distance

    assert _osa_distance("baer", "bear") == 1
    assert _osa_distance("abc", "abc") == 0
    assert _osa_distance("ab", "ba") == 1
    assert _osa_distance("abcd", "badc") == 2
    assert _osa_distance("kitten", "sitting") == 3
    assert _osa_distance("", "ab") == 2


# ------------------------------------------------------------- dedup caps
def test_shingles_window_and_short_docs(spark):
    from lucenenet_spark.functions import dedup as fdedup

    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b"), (2, "x")], "doc_id long, text string"
    )
    sh = {(r["doc_id"], r["shingle"]) for r in fdedup.shingles(df, n=3).collect()}
    assert sh == {(0, "a b c"), (0, "b c d")}


def test_shingle_df_cap(spark):
    from lucenenet_spark.functions import dedup as fdedup

    rows = [(i, "very common shingle text " + f"unique{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = fdedup.capped_shingles(df, n=3, df_cap=5)
    # 'very common shingle' and 'common shingle text' appear in all 10 docs
    # -> dropped; no surviving shingle has df > 5
    dfs = (
        capped.groupBy("shingle").count().collect()
    )
    assert all(r["count"] <= 5 for r in dfs)
    assert all("very common shingle" != r["shingle"] for r in dfs)


def test_lsh_bucket_cap_drops_mega_buckets(spark):
    from lucenenet_spark.functions import dedup as fdedup

    # 12 identical docs + 1 outlier: all 12 share every bucket
    rows = [(i, "same words everywhere forever again") for i in range(12)]
    rows.append((99, "completely different content here now"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = fdedup.shingles(df, n=3).withColumnRenamed("shingle", "term")
    pairs_uncapped = fdedup.minhash_lsh_pairs(sh, 16, 4, max_bucket_size=None).count()
    pairs_capped = fdedup.minhash_lsh_pairs(sh, 16, 4, max_bucket_size=8).count()
    assert pairs_uncapped == 66  # 12 choose 2
    assert pairs_capped == 0  # mega-bucket dropped


def test_jaccard_verify_matches_allpairs(spark):
    """Verify-stage Jaccard over LSH candidates finds the same >=0.8 pairs
    as a brute-force computation on a corpus with clear near-dups."""
    from itertools import combinations

    from lucenenet_spark.functions import dedup as fdedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("kappa", "lambda")),  # near dup
        (3, "totally different words in this one document here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # brute force in python
    def sh3(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    expect = set()
    sets = {r[0]: sh3(r[1]) for r in rows}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        jq = int(j * 10000 + 0.5)
        if jq >= 7000:
            expect.add((a, b, jq))

    # verify stage with an explicit (all-pairs) candidate set computes
    # exact Jaccard — byte-equal to brute force
    all_pairs = spark.createDataFrame(
        [(a, b) for a, b in combinations(sorted(sets), 2)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jacc_q"])
        for r in fdedup.ngram_jaccard_pairs(
            df, n=3, threshold_q=7000, candidates=all_pairs
        ).collect()
    }
    assert got == expect

    # full LSH path: identical docs (J=1.0) collide in EVERY band, so the
    # exact-dup pair is found deterministically; anything the LSH path
    # reports must also be a true >=0.7 pair (verify stage is exact)
    got_lsh = {
        (r["doc_a"], r["doc_b"], r["jacc_q"])
        for r in fdedup.ngram_jaccard_pairs(df, n=3, threshold_q=7000).collect()
    }
    assert (0, 1, 10000) in got_lsh
    assert got_lsh <= expect


# ------------------------------------------------------------- ANN recall
def test_ann_multiprobe_recall(spark):
    """Multi-probe LSH must beat single-probe recall and clear a floor on
    a clustered fixture (queries from dense clusters are ANN's use case)."""
    import random

    import lucenenet_spark.functions.similarity as fsim

    rng = random.Random(7)
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(5)]
    rows = []
    for vid in range(300):
        c = centers[vid % 5]
        rows.append((vid, [x + rng.gauss(0, 0.05) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvec = [float(x) for x in rows[0][1]]
    exact = [r["vec_id"] for r in fsim.cosine_topk_arrays(emb, qvec, 10).collect()]

    def recall(n_probes):
        ann = [
            r["vec_id"]
            for r in fsim.ann_lsh_topk(
                emb, 0, 10, n_planes=8, dim=16, n_probes=n_probes
            ).collect()
        ]
        return len(set(ann) & set(exact)) / 10.0

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 >= 0.9


# ------------------------------------------------------------- sloppy freq
def test_sloppy_reference_golden_cases():
    """The reference's own TestSloppyPhraseQuery expectations (DOC_1..5,
    QUERY_1/2/4/5_4 with whitespace tokens) against the PhraseFreq port —
    including repeated-term queries and the LUCENE-3412 regression."""
    from lucenenet_spark.search.sloppy import sloppy_phrase_freq

    def freq(doc, query, slop):
        toks, qt = doc.split(), query.split()
        offsets = list(range(len(qt)))
        pos_lists = []
        for o, t in zip(offsets, qt):
            ps = sorted(i - o for i, w in enumerate(toks) if w == t)
            if not ps:
                return 0.0
            pos_lists.append(ps)
        return sloppy_phrase_freq(pos_lists, offsets, slop, terms=qt)

    S1, S2 = "A A A", "A 1 2 3 A 4 5 6 A"
    D1, D2, D3 = f"X {S1} Y", f"X {S2} Y", f"X {S1} A Y"
    D1B = f"X {S1} Y N N N N {S1} Z"
    D2B = f"X {S2} Y N N N N {S2} Z"
    D3B = f"X {S1} A Y N N N N {S1} A Y"
    D4 = "A A X A X B A X B B A A X B A A"
    D53, D54 = "H H H X X X H H H X X X H H H", "H H H H"

    for slop in range(30):
        assert (freq(D4, "X A A", slop) > 0) == (slop >= 1)
        assert freq(D1, S1, slop) > 0 and freq(D1B, S1, slop) > freq(D1, S1, slop)
        assert (freq(D2, S1, slop) > 0) == (slop >= 6)
        if slop >= 6:
            assert freq(D2B, S1, slop) > freq(D2, S1, slop)
        assert freq(D2, S2, slop) > 0 and freq(D2B, S2, slop) > freq(D2, S2, slop)
        assert freq(D3, S1, slop) > 0 and freq(D3B, S1, slop) > freq(D3, S1, slop)
    for slop in range(3):
        assert freq(D54, "H H H H", slop) > 0
        assert freq(D53, "H H H H", slop) == 0


def test_sloppy_closed_form_matches_walk():
    """The 2-term zigzag-chain closed form used by the phrase_sloppy SQL
    oracle equals the PhraseFreq walk on randomized position lists:
    q1 = larger of the first elements (tie -> B's); q_{i+1} = other list's
    least element > q_i; match = q_i - (other list's largest <= q_i)."""
    import random

    from lucenenet_spark.search.sloppy import sloppy_phrase_freq

    def closed(A, B, slop):
        lists = {0: sorted(A), 1: sorted(B)}
        q, src = (B[0], 1) if A[0] <= B[0] else (A[0], 0)
        acc = 0.0
        while True:
            other = lists[1 - src]
            u = max(x for x in other if x <= q)
            if q - u <= slop:
                acc += 1.0 / (1.0 + (q - u))
            nxt = [x for x in other if x > q]
            if not nxt:
                return acc
            q, src = min(nxt), 1 - src

    rng = random.Random(42)
    for _ in range(400):
        A = sorted(rng.sample(range(0, 30), rng.randint(1, 6)))
        B = sorted(rng.sample(range(0, 30), rng.randint(1, 6)))
        slop = rng.randint(0, 4)
        got = sloppy_phrase_freq([A, B], [0, 1], slop, terms=["x", "y"])
        assert abs(got - closed(A, B, slop)) < 1e-12, (A, B, slop)


def test_repeated_term_sloppy_end_to_end(spark):
    """Engine-level repeated-term sloppy phrase vs the pyoracle."""
    from lucenenet_spark.oracle import PyIndex

    docs = {0: "x a a a y", 1: "a q q a q q a", 2: "a a", 3: "b a b a b"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    s = IndexSearcher(build_index(df))
    py = PyIndex(docs)
    for slop in (0, 2, 6):
        q = PhraseQuery(terms=("a", "a", "a"), slop=slop)
        got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
        want = py.sloppy_phrase_scores(["a", "a", "a"], slop)
        assert set(got) == set(want), (slop, got, want)
        for d in got:
            assert got[d] == pytest.approx(want[d], rel=1e-6), (slop, d)


# ------------------------------------------------------------- TFIDF/classic
def test_classic_similarity_parity(spark, corpus, corpus_df):
    """ClassicSimilarity (TFIDF with queryNorm + coord) float32 parity
    against the pure-Python oracle (TFIDFSimilarity.cs/DefaultSimilarity.cs
    float path), golden-score style like the BM25 parity suite."""
    from lucenenet_spark.oracle import PyIndex
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    idx = build_index(corpus_df).cache()
    s = IndexSearcher(idx, similarity="classic")
    py = PyIndex(corpus)

    # single term
    got = {r["doc_id"]: r["score"] for r in s.scored(TermQuery("w0003")).collect()}
    want = py.classic_scores(musts=[("w0003", 1.0)])
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d

    # OR with boost (queryNorm over both weights, coord 1/2 vs 2/2)
    q = BooleanQuery.of(
        (TermQuery("w0000", boost=2.0), Occur.SHOULD),
        (TermQuery("w0002"), Occur.SHOULD),
    )
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    want = py.classic_scores(shoulds=[("w0000", 2.0), ("w0002", 1.0)])
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d

    # MUST + SHOULD + NOT
    q = BooleanQuery.of(
        (TermQuery("w0000"), Occur.MUST),
        (TermQuery("w0002"), Occur.SHOULD),
        (TermQuery("w0005"), Occur.MUST_NOT),
    )
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    want = py.classic_scores(
        musts=[("w0000", 1.0)], shoulds=[("w0002", 1.0)], nots=["w0005"]
    )
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-6), d


def test_classic_vs_bm25_differ(spark, corpus_df):
    idx = build_index(corpus_df).cache()
    bm = IndexSearcher(idx)
    cl = IndexSearcher(idx, similarity="classic")
    a = {r["doc_id"]: r["score"] for r in bm.scored(TermQuery("w0003")).collect()}
    b = {r["doc_id"]: r["score"] for r in cl.scored(TermQuery("w0003")).collect()}
    assert set(a) == set(b)  # same match set, different scores
    assert any(abs(a[d] - b[d]) > 1e-9 for d in a)


# ------------------------------------------------------------- parser v2
def test_parser_addclause_semantics():
    """Classic QueryParserBase.AddClause operator mutation: AND upgrades
    the previous clause to MUST (unless prohibited); OR under default-AND
    demotes it to SHOULD; +/-/NOT on the current clause win."""
    from lucenenet_spark.queryparser.parser import QueryParser
    from lucenenet_spark.search.queries import BooleanQuery, Occur

    def shape(parser, s):
        q = parser.parse(s)
        if not isinstance(q, BooleanQuery):
            return [(q.term, "SINGLE")]
        return [(c.query.term, c.occur.value) for c in q.clauses]

    p_or = QueryParser(default_operator="OR")
    p_and = QueryParser(default_operator="AND")
    assert shape(p_or, "cat OR dog AND fox") == [
        ("cat", "SHOULD"), ("dog", "MUST"), ("fox", "MUST")]
    assert shape(p_and, "cat OR dog AND fox") == [
        ("cat", "SHOULD"), ("dog", "MUST"), ("fox", "MUST")]
    assert shape(p_and, "cat dog") == [("cat", "MUST"), ("dog", "MUST")]
    assert shape(p_and, "cat OR dog") == [("cat", "SHOULD"), ("dog", "SHOULD")]
    assert shape(p_or, "cat -dog AND fox") == [
        ("cat", "SHOULD"), ("dog", "MUST_NOT"), ("fox", "MUST")]
    assert shape(p_and, "NOT cat AND dog") == [("cat", "MUST_NOT"), ("dog", "MUST")]


def test_parser_ranges_and_escapes():
    from lucenenet_spark.queryparser.parser import QueryParser
    from lucenenet_spark.search.queries import PrefixQuery, TermQuery, TermRangeQuery

    p = QueryParser()
    q = p.parse("{apple TO banana}")
    assert isinstance(q, TermRangeQuery)
    assert (q.lower, q.upper, q.include_lower, q.include_upper) == (
        "apple", "banana", False, False)
    q = p.parse("price:[* TO zebra]")
    assert q.field == "price" and q.lower is None and q.include_upper
    q = p.parse(r"foo\*")
    assert isinstance(q, TermQuery) and q.term == "foo"
    q = p.parse("foo*")
    assert isinstance(q, PrefixQuery) and q.prefix == "foo"
    # escaped colon is literal, not a field separator
    q = p.parse(r"foo\:bar")
    from lucenenet_spark.search.queries import BooleanQuery
    assert isinstance(q, BooleanQuery)  # analyzed to two terms, no field
    assert all(c.query.field is None for c in q.clauses)


# ------------------------------------------------------------- LM similarities
def test_lm_golden_scores():
    """Reference golden values (TestSimilarityBase.cs:174-200 stats;
    TestLMDirichlet / TestLMJelinekMercer formulas), FLOAT_EPSILON=1e-5."""
    import math

    import numpy as np

    from lucenenet_spark.search.lm import lm_dirichlet_score_scalar, lm_jm_score_scalar

    f32 = np.float32
    FREQ, DOC_LEN, TTF, NFT = 7.0, 40.0, 70, 5000
    p = f32((FREQ + 2000.0 * (TTF + 1) / (NFT + 1.0)) / (DOC_LEN + 2000.0))
    a = f32(2000.0 / (DOC_LEN + 2000.0))
    gold_d = float(f32(math.log(p / (a * f32((TTF + 1) / (NFT + 1.0)))) + math.log(a)))
    assert lm_dirichlet_score_scalar(FREQ, DOC_LEN, TTF, NFT) == pytest.approx(gold_d, abs=1e-5)
    pj = f32((1 - 0.1) * FREQ / DOC_LEN + 0.1 * (TTF + 1) / (NFT + 1.0))
    gold_j = float(f32(math.log(pj / (0.1 * f32((TTF + 1) / (NFT + 1.0))))))
    assert lm_jm_score_scalar(FREQ, DOC_LEN, TTF, NFT, lam=0.1) == pytest.approx(gold_j, abs=1e-5)


def test_lm_engine_parity(spark, corpus, corpus_df):
    """LMSearcher lucene mode vs scalar recompute with quantized docLen
    (SimilarityBase.DecodeNormValue path)."""
    import numpy as np

    from lucenenet_spark.index.smallfloat import norm_table
    from lucenenet_spark.search.lm import LMSearcher, lm_dirichlet_score_scalar
    from lucenenet_spark.oracle import PyIndex

    idx = build_index(corpus_df).cache()
    s = LMSearcher(idx, model="dirichlet", mode="lucene")
    py = PyIndex(corpus)
    tbl = norm_table().astype(np.float64)
    term = "w0003"
    ttf = sum(len(ps) for ps in py.postings[term].values())
    got = {r["doc_id"]: r["score"] for r in s.scored(TermQuery(term)).collect()}
    assert set(got) == set(py.postings[term])
    for d, ps in py.postings[term].items():
        dl_q = float(tbl[py.norm_byte[d]])
        want = lm_dirichlet_score_scalar(len(ps), dl_q, ttf, py.sum_ttf)
        assert got[d] == pytest.approx(want, rel=1e-6), d


# ------------------------------------------------------------- folding/synonyms
def test_ascii_folding_end_to_end(spark):
    """FoldingAnalyzer: accented corpus searchable through folded query
    terms (query side uses the same analyzer)."""
    from lucenenet_spark.analysis.analyzers import FoldingAnalyzer

    docs = {0: "Café au lait", 1: "cafe plain", 2: "naïve résumé", 3: "unrelated"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    s = IndexSearcher(build_index(df, analyzer=FoldingAnalyzer()))
    assert sorted(r["doc_id"] for r in s.search_text("cafe", 10).collect()) == [0, 1]
    assert sorted(r["doc_id"] for r in s.search_text("café", 10).collect()) == [0, 1]
    assert sorted(r["doc_id"] for r in s.search_text("naive resume", 10).collect()) == [2]


def test_synonym_expansion_end_to_end(spark):
    from lucenenet_spark.analysis.synonyms import expand_synonyms

    docs = {0: "the quick fox", 1: "a fast fox", 2: "a rapid response", 3: "slow snail"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    s = IndexSearcher(build_index(df))
    syn = {"quick": ["fast", "rapid"]}
    q = expand_synonyms(TermQuery("quick"), syn)
    assert sorted(r["doc_id"] for r in s.scored(q).collect()) == [0, 1, 2]
    # phrase slot expansion -> MultiPhraseQuery
    q2 = expand_synonyms(PhraseQuery(terms=("quick", "fox")), syn)
    assert isinstance(q2, MultiPhraseQuery)
    assert sorted(r["doc_id"] for r in s.scored(q2).collect()) == [0, 1]


# ------------------------------------------------------------- doc-id integrity
def test_assign_doc_ids_dense_unique(spark):
    """Regression: repartitionByRange samples range boundaries with an
    RDD-id-derived seed, so recomputing the partitioning between the
    counts job and the assignment job could shift rows across boundaries,
    producing DUPLICATE and MISSING doc_ids (observed: 2048-row corpus
    with ids 1024-1027 duplicated, 507-511 missing). The partitioned frame
    is now persisted so both jobs read one materialization."""
    from lucenenet_spark.index.builder import assign_doc_ids

    rows = [(f"https://x.com/{d:06d}", f"w{d % 7} text") for d in range(2048)]
    df = spark.createDataFrame(rows, "url string, text string")
    out = assign_doc_ids(df, "url")
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(2048))
    # and stable: re-running assigns the same id per url
    a = {r["url"]: r["doc_id"] for r in out.collect()}
    b = {r["url"]: r["doc_id"] for r in assign_doc_ids(df, "url").collect()}
    assert a == b


def test_pl2_golden_and_engine(spark, corpus, corpus_df):
    """DFR PL2 golden value (TestSimilarityBase.TestPL2: 2.2923636 for
    freq=7, dl=40, avg=50, ttf=70, N=100) + engine parity with quantized
    docLen."""
    import numpy as np

    from lucenenet_spark.index.smallfloat import norm_table
    from lucenenet_spark.oracle import PyIndex
    from lucenenet_spark.search.lm import LMSearcher, dfr_pl2_score_scalar

    assert dfr_pl2_score_scalar(7.0, 40.0, 70, 100, 50.0) == pytest.approx(
        2.2923636, abs=1e-5
    )
    idx = build_index(corpus_df).cache()
    s = LMSearcher(idx, model="pl2", mode="lucene")
    py = PyIndex(corpus)
    tbl = norm_table().astype(np.float64)
    term = "w0003"
    ttf = sum(len(ps) for ps in py.postings[term].values())
    avg = float(np.float32(np.float32(py.sum_ttf) / py.max_doc))
    got = {r["doc_id"]: r["score"] for r in s.scored(TermQuery(term)).collect()}
    assert set(got) == set(py.postings[term])
    for d, ps in py.postings[term].items():
        dl_q = float(tbl[py.norm_byte[d]])
        want = dfr_pl2_score_scalar(len(ps), dl_q, ttf, py.max_doc, avg)
        assert got[d] == pytest.approx(want, rel=1e-5), d
