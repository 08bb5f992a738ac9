"""Round-4 regression tests: ADVICE r3 fixes + persisted-intermediate
lifecycle for the dedup pipeline."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup persist lifecycle: repeated invocations must not grow executor
# storage (VERDICT r3 "What's wrong" #2)
# ---------------------------------------------------------------------------
def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_dedup_intermediates_bounded(spark, corpus_df):
    from lucenenet_spark.functions import dedup

    dedup.release_intermediates()
    base = _n_persistent(spark)
    counts = []
    for _ in range(3):
        pairs = dedup.ngram_jaccard_pairs(corpus_df, n=3, threshold_q=5000)
        pairs.count()
        counts.append(_n_persistent(spark) - base)
    # bounded at one invocation's worth (3 tracked frames), not 3x growth
    assert counts[0] <= dedup._MAX_LIVE
    assert counts[-1] <= dedup._MAX_LIVE
    dedup.release_intermediates()
    assert _n_persistent(spark) - base == 0


# ---------------------------------------------------------------------------
# surround not() arity (ADVICE r3 #2)
# ---------------------------------------------------------------------------
def test_surround_not_single_operand_rejected(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.queryparser.surround import surround_docs

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    with pytest.raises(ValueError, match="not\\(\\) requires"):
        surround_docs(idx, "and(w(w0000, w0001), not(w0002))")
    # 2-operand form still works: a minus b
    a = {r.doc_id for r in surround_docs(idx, "not(w0000, w0001)").collect()}
    has_a = {r.doc_id for r in idx.postings.filter(F.col("term") == "w0000")
             .select("doc_id").distinct().collect()}
    has_b = {r.doc_id for r in idx.postings.filter(F.col("term") == "w0001")
             .select("doc_id").distinct().collect()}
    assert a == has_a - has_b


# ---------------------------------------------------------------------------
# sampled facet: overflow-safe hash, non-divisor percent scaling (ADVICE #3)
# ---------------------------------------------------------------------------
def test_sampled_facet_large_doc_ids_and_odd_percent(spark):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.collectors import sampled_facet_counts
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    # doc_ids far beyond 2^32: the old doc_id * 2654435761 overflowed int64
    big = 5_000_000_000
    rows = [(big + i, f"apple common{i % 7}", "s" + str(i % 2)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    idx = build_index(docs, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    out = sampled_facet_counts(s, TermQuery("apple"), docs, "source", percent=33)
    got = {r["source"]: r["est_cnt"] for r in out.collect()}
    # exact expected: replicate hash + floor(n*100/33+0.5) in python
    import collections
    sampled = collections.Counter()
    for did, _txt, src in rows:
        if (did % 2147483648) * 2654435761 % 100 < 33:
            sampled[src] += 1
    exp = {s_: int(n * 100.0 / 33 + 0.5) for s_, n in sampled.items()}
    assert got == exp
    # sanity: sample rate is ~percent, not ~50%+ (the overflow symptom)
    assert sum(sampled.values()) <= 60 * 0.5


# ---------------------------------------------------------------------------
# FreeTextSuggester: empty / unseen context falls back to unigram ranking
# (ADVICE r3 #5)
# ---------------------------------------------------------------------------
def test_free_text_suggest_empty_context(spark):
    from lucenenet_spark.search.suggest import FreeTextSuggester

    docs = spark.createDataFrame(
        [(0, "merge keys fast merge keys"), (1, "merge sort slow")],
        "doc_id long, text string",
    )
    sug = FreeTextSuggester(docs).cache()
    # empty context -> unigram backoff, NOT zero rows
    out = sug.lookup("", "me", 5).collect()
    assert [r["token"] for r in out] == ["merge"]
    # context word never seen in the corpus -> same backoff
    out2 = sug.lookup("zzzunseen", "me", 5).collect()
    assert [r["token"] for r in out2] == ["merge"]
    # normal context path unchanged: bigram (fast, merge) exists
    out3 = sug.lookup("fast", "me", 5).collect()
    assert [r["token"] for r in out3] == ["merge"]


# ---------------------------------------------------------------------------
# block searcher: stopword-scale meta is never collected (ADVICE r3 #1),
# and skipped IN-lists report honest pruning stats (ADVICE r3 #4)
# ---------------------------------------------------------------------------
def test_load_meta_budget_without_collect(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.block_searcher import BlockIndexSearcher

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    bs = BlockIndexSearcher(idx, meta_cache_max_rows=0)
    fld = idx.default_field
    meta = bs._load_meta(fld, ["w0000"])
    # over budget by estimate -> marked None with ZERO rows collected
    assert meta["w0000"] is None
    assert bs._meta_rows == 0
    # queries still work through the distributed fallback
    top = bs.topk_term("w0000", k=5).collect()
    assert len(top) == 5


# ---------------------------------------------------------------------------
# SearchAfter: exploded vs block path, multi-page walk equals one deep list
# ---------------------------------------------------------------------------
def _walk_pages(fetch, k, pages):
    out, after = [], None
    for _ in range(pages):
        rows = fetch(after, k)
        if not rows:
            break
        out.extend(rows)
        after = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
    return out


def test_search_after_pages_equal_deep_topk(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.block_searcher import BlockIndexSearcher
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="lucene")
    bs = BlockIndexSearcher(idx)

    q = TermQuery("w0000")
    deep = s.search(q, 40).collect()
    paged = _walk_pages(lambda a, k: s.search_after(a, q, k).collect(), 10, 4)
    assert [(r["doc_id"], r["score"]) for r in paged] == [
        (r["doc_id"], r["score"]) for r in deep
    ]

    # block path single-term: truncated-impact theta, rank-identical
    bpaged = _walk_pages(lambda a, k: bs.topk_term("w0000", k, after=a).collect(), 10, 4)
    assert [(r["doc_id"], r["score"]) for r in bpaged] == [
        (r["doc_id"], r["score"]) for r in deep
    ]

    # multi-term OR pages (no theta, keyset only) vs exploded boolean OR
    bq = BooleanQuery.of(
        (TermQuery("w0000"), Occur.SHOULD), (TermQuery("w0001"), Occur.SHOULD)
    )
    deep_or = s.search(bq, 30).collect()
    bpaged_or = _walk_pages(
        lambda a, k: bs.topk_or({"w0000": 1.0, "w0001": 1.0}, k, after=a).collect(),
        10, 3,
    )
    assert [(r["doc_id"], r["score"]) for r in bpaged_or] == [
        (r["doc_id"], r["score"]) for r in deep_or
    ]


# ---------------------------------------------------------------------------
# SimpleQueryParser: never throws, garbage degrades to terms
# ---------------------------------------------------------------------------
def test_simple_parser_never_throws(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.queryparser.simple import SimpleQueryParser
    from lucenenet_spark.search.searcher import IndexSearcher

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    p = SimpleQueryParser(analyzer=idx.analyzer)
    garbage = [
        "((((w0000", 'w0000 ) ) "', '"w0000 w0001', "+|+|-", "", "   ",
        "w0000~9", "w00*", "*", "-w0000 | +w0001", '\\"\\(\\)', "a the is",
    ]
    for g in garbage:
        q = p.parse(g)  # must never raise
        if q is None:
            continue
        try:
            s.docset(q).count()  # parsed queries must be executable
        except ValueError:
            # pure-negation booleans legitimately match nothing (Lucene
            # raises the same way) — parsing still never threw
            pass


def test_simple_parser_semantics(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.queryparser.simple import SimpleQueryParser
    from lucenenet_spark.search.searcher import IndexSearcher

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    s = IndexSearcher(idx, mode="double")
    p = SimpleQueryParser(analyzer=idx.analyzer)

    def ids(q):
        return {r.doc_id for r in s.docset(q).collect()}

    def term_docs(t):
        return {
            r.doc_id
            for r in idx.postings.filter(F.col("term") == t)
            .select("doc_id").distinct().collect()
        }

    a, b, c = term_docs("w0000"), term_docs("w0001"), term_docs("w0002")
    # '+' = AND, '|' = OR, '-' = NOT, default operator OR
    assert ids(p.parse("w0000 +w0001")) == (a & b)
    assert ids(p.parse("w0000 | w0001")) == (a | b)
    assert ids(p.parse("w0000 -w0001")) == a - b
    assert ids(p.parse("w0000 w0001")) == (a | b)
    assert ids(p.parse("(w0000 +w0001) | w0002")) == (a & b) | c
    # AND default operator
    pa = SimpleQueryParser(default_operator="AND", analyzer=idx.analyzer)
    assert ids(pa.parse("w0000 w0001")) == (a & b)
    assert ids(pa.parse("w0000 w0001 -w0002")) == (a & b) - c


# ---------------------------------------------------------------------------
# Trained IVF quantizer: recall vs brute force at fixed nprobe, cell balance
# (all deterministic: pinned sample, seeded k-means, fixed corpus)
# ---------------------------------------------------------------------------
def test_trained_ivf_recall_and_balance(spark):
    import os
    if not os.path.exists("/root/testdata/sf0.001/embeddings.parquet"):
        import pytest as _pytest
        _pytest.skip("testdata not present")
    from lucenenet_spark.functions import similarity as fsim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    trained = fsim.trained_ivf_centroids(16, 7)
    untrained = fsim.ivf_centroids(16, 7, 64)
    assert len(trained) == 16 and all(len(c) == 64 for c in trained)
    # determinism: retraining yields the identical literals
    fsim._TRAINED_CACHE.clear()
    assert fsim.trained_ivf_centroids(16, 7) == trained

    # balance: trained cells stay near-uniform (max <= 2x mean)
    counts = [r["count"] for r in fsim.ivf_assign(emb, trained).groupBy("cid").count().collect()]
    assert max(counts) <= 2 * (sum(counts) / len(counts))

    def mean_recall(cents, nprobe):
        recs = []
        for qid in (0, 7, 123):
            qvec = [float(x) for x in emb.filter(emb.vec_id == qid)
                    .select("embedding").collect()[0][0]]
            exact = {r["vec_id"] for r in fsim.cosine_topk_arrays(emb, qvec, 10).collect()}
            approx = {r["vec_id"] for r in
                      fsim.ivf_topk(emb, qid, 10, nprobe=nprobe, centroids=cents).collect()}
            recs.append(len(exact & approx) / 10)
        return sum(recs) / len(recs)

    t2, u2 = mean_recall(trained, 2), mean_recall(untrained, 2)
    t4 = mean_recall(trained, 4)
    # measured: trained 0.467/0.700 at nprobe 2/4 vs untrained 0.200/0.367
    assert t2 >= 0.4 and t4 >= 0.6
    assert t2 > u2


# ---------------------------------------------------------------------------
# CommonGrams: gram-term indexing for stopword phrases; query filter
# ---------------------------------------------------------------------------
def test_common_grams_analyzer_and_query(spark):
    from lucenenet_spark.analysis.analyzers import CommonGramsAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import PhraseQuery, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    az = CommonGramsAnalyzer()
    # index side: unigrams all kept, gram at the common-adjacent pair
    toks = [(t, p) for t, p in az.tokenize_text("big the merge fast")]
    assert ("the", 1) in toks and ("merge", 2) in toks  # no stop removal
    assert ("big_the", 0) in toks and ("the_merge", 1) in toks
    assert ("merge_fast", 2) not in toks  # neither side common
    # query side: absorbed unigrams dropped
    assert az.query_terms("the merge") == [("the_merge", 0)]
    assert az.query_terms("big the merge") == [("big_the", 0), ("the_merge", 1)]
    assert az.query_terms("big merge") == [("big", 0), ("merge", 1)]

    docs = spark.createDataFrame(
        [(0, "run the merge now"), (1, "the merge failed"), (2, "a merge the end")],
        "doc_id long, text string",
    )
    idx = build_index(docs, analyzer=az)
    s = IndexSearcher(idx, mode="double")
    # "the merge" phrase = ONE term lookup on the gram
    qt = az.query_terms("the merge")
    assert len(qt) == 1
    hits = {r.doc_id for r in s.docset(TermQuery(qt[0][0])).collect()}
    assert hits == {0, 1}
    # multi-gram phrase path: overlapping grams chain with positions
    qt2 = az.query_terms("run the merge")
    q2 = PhraseQuery(terms=tuple(t for t, _ in qt2),
                     positions=tuple(p for _, p in qt2))
    assert {r.doc_id for r in s.docset(q2).collect()} == {0}


# ---------------------------------------------------------------------------
# NGramPhraseQuery over CharNGramAnalyzer: thinned == full gram phrase
# ---------------------------------------------------------------------------
def test_ngram_phrase_query(spark):
    from lucenenet_spark.analysis.analyzers import CharNGramAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import (
        NGramPhraseQuery,
        PhraseQuery,
        rewrite,
    )
    from lucenenet_spark.search.searcher import IndexSearcher

    az = CharNGramAnalyzer(n=2)
    assert az.grams("spark") == ["sp", "pa", "ar", "rk"]
    # rewrite keeps grams 0, 2, ... and the last, positions preserved
    q = rewrite(NGramPhraseQuery(n=2, terms=("sp", "pa", "ar", "rk")))
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("sp", "ar", "rk") and q.positions == (0, 2, 3)

    docs = spark.createDataFrame(
        [(0, "spark rules"), (1, "sparse parks"), (2, "spar krk")],
        "doc_id long, text string",
    )
    idx = build_index(docs, analyzer=az)
    s = IndexSearcher(idx, mode="double")
    grams = tuple(az.grams("spark"))
    full = {r.doc_id for r in s.docset(PhraseQuery(terms=grams)).collect()}
    thin = {r.doc_id for r in s.docset(NGramPhraseQuery(n=2, terms=grams)).collect()}
    # doc 2 has all of spark's bigrams ('spar' gives sp,pa,ar; 'krk' gives
    # kr,rk) but never consecutively across the token gap
    assert thin == full == {0}


# ---------------------------------------------------------------------------
# DictionaryCompoundWordTokenFilter analogue
# ---------------------------------------------------------------------------
def test_compound_word_analyzer(spark):
    from lucenenet_spark.analysis.analyzers import CompoundWordAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    az = CompoundWordAnalyzer(frozenset({"soft", "ball", "team", "all"}))
    # original kept; dictionary subwords at the same position ('all' is a
    # substring hit too — brute-force decompose, as in the reference)
    toks = az.tokenize_text("softballteam wins")
    assert ("softballteam", 0) in toks and ("wins", 1) in toks
    assert ("soft", 0) in toks and ("ball", 0) in toks and ("team", 0) in toks
    assert ("all", 0) in toks
    # longest-match mode keeps one hit per start offset
    azl = CompoundWordAnalyzer(
        frozenset({"soft", "ball", "team", "all"}), only_longest_match=True
    )
    toksl = azl.tokenize_text("softballteam")
    assert ("ball", 0) in toksl and ("all", 0) in toksl
    # short tokens are not decomposed
    assert az.decompose("ball") == []

    docs = spark.createDataFrame(
        [(0, "softballteam plays"), (1, "the ball rolls"), (2, "nothing here")],
        "doc_id long, text string",
    )
    idx = build_index(docs, analyzer=az)
    s = IndexSearcher(idx, mode="double")
    assert {r.doc_id for r in s.docset(TermQuery("ball")).collect()} == {0, 1}
    assert {r.doc_id for r in s.docset(TermQuery("softballteam")).collect()} == {0}


# ---------------------------------------------------------------------------
# CJKAnalyzer: overlapping Han/Hiragana bigrams (CJKBigramFilter)
# ---------------------------------------------------------------------------
def test_cjk_bigram_analyzer(spark):
    from lucenenet_spark.analysis.analyzers import CJKAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import PhraseQuery, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    az = CJKAnalyzer()
    toks = az.tokenize_text("我是中国人")
    assert [t for t, _ in toks] == ["我是", "是中", "中国", "国人"]
    assert [pp for _, pp in toks] == [0, 1, 2, 3]
    # mixed script: latin passes through, lone CJK char stays a unigram
    toks2 = az.tokenize_text("mixed 中 latin 日本")
    assert [t for t, _ in toks2] == ["mixed", "中", "latin", "日本"]
    # output_unigrams keeps both granularities
    azu = CJKAnalyzer(output_unigrams=True)
    t3 = [t for t, _ in azu.tokenize_text("中国")]
    assert t3 == ["中", "中国", "国"]

    docs = spark.createDataFrame(
        [(0, "我是中国人"), (1, "中国 hello"), (2, "国中 reversed")],
        "doc_id long, text string",
    )
    idx = build_index(docs, analyzer=az)
    s = IndexSearcher(idx, mode="double")
    # bigram term search: order matters (国中 != 中国)
    assert {r.doc_id for r in s.docset(TermQuery("中国")).collect()} == {0, 1}
    # bigram phrase = longer substring match
    ph = PhraseQuery(terms=("中国", "国人"))
    assert {r.doc_id for r in s.docset(ph).collect()} == {0}


# ---------------------------------------------------------------------------
# RoutedSearcher pages: block-routed and exploded-fallback shapes both
# equal the deep top-k
# ---------------------------------------------------------------------------
def test_routed_search_after(spark, corpus_df):
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.queries import PhraseQuery, TermQuery
    from lucenenet_spark.search.router import RoutedSearcher
    from lucenenet_spark.search.searcher import IndexSearcher

    idx = build_index(corpus_df, text_col="text", id_col="doc_id")
    r = RoutedSearcher(idx)
    s = IndexSearcher(idx, mode="lucene")

    q = TermQuery("w0000")
    deep = [(x["doc_id"], x["score"]) for x in s.search(q, 30).collect()]
    paged = _walk_pages(lambda a, k: r.search(q, k, after=a).collect(), 10, 3)
    assert [(x["doc_id"], x["score"]) for x in paged] == deep
    assert r.last_route.startswith("block")

    # phrase pages take the exploded keyset fallback, still rank-identical
    pq = PhraseQuery(terms=("w0000", "w0001"))
    deep_p = [(x["doc_id"], x["score"]) for x in s.search(pq, 20).collect()]
    paged_p = _walk_pages(lambda a, k: r.search(pq, k, after=a).collect(), 10, 2)
    assert [(x["doc_id"], x["score"]) for x in paged_p] == deep_p
