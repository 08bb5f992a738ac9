"""Gate registry round-5 part t: link-graph PageRank (Page et al. 1999)
over a deterministic synthetic web graph, and Stupid-Backoff bigram LM
document scoring (Brants et al. EMNLP'07) with a held-out training
split so the backoff path is exercised.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate

_PR_D = 0.85
_PR_ITERS = 5
_PR_K = 20

# the deterministic synthetic link graph, shared by every graph gate
# (mirrors functions/pagerank.py build_link_graph bit-for-bit)
_GRAPH_CTES = """nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
edges AS (
  SELECT src,
         CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst,
         deg
  FROM (
    SELECT nd.doc_id AS src,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           CAST(nd.doc_id % 3 + 1 AS BIGINT) AS deg,
           nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
)"""


def _pagerank_sql() -> str:
    """Unrolled power iteration: the synthetic edge generator (Knuth
    multiplicative hash, self-loops deflected), then ITERS chained
    CTEs each doing the edges ⋈ ranks contribution join — identical
    IEEE arithmetic to the Spark loop, quantized 1e-7 at the end."""
    tele = 1.0 - _PR_D
    iters = []
    for k in range(1, _PR_ITERS + 1):
        iters.append(f"""
r{k} AS (
  SELECT nd.doc_id,
         {tele!r} * (1.0 / nn.n) + {_PR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(r.pr / e.deg) AS m
    FROM edges e JOIN r{k - 1} r ON r.doc_id = e.src GROUP BY e.dst
  ) c USING (doc_id)
  CROSS JOIN nn
)""")
    return f"""
WITH {_GRAPH_CTES},
r0 AS (SELECT nd.doc_id, 1.0 / nn.n AS pr FROM nodes nd CROSS JOIN nn),{",".join(iters)}
SELECT doc_id,
       CAST(floor(pr * 10000000.0 + 0.5) AS BIGINT) AS rank_q
FROM r{_PR_ITERS}
ORDER BY rank_q DESC, doc_id ASC LIMIT {_PR_K}
"""


@gate("pagerank_topk", _pagerank_sql())
def pagerank_topk(spark, sf_dir):
    """Distributed PageRank (Page et al. 1999), 5 power iterations at
    d=0.85 over the deterministic synthetic link graph (every doc emits
    1 + id%3 edges via a Knuth multiplicative hash; no dangling nodes).
    The oracle regenerates the graph and unrolls the 5 iterations as
    chained CTEs; ranks quantized 1e-7 with doc-id tie-breaks."""
    from lucenenet_spark.functions.pagerank import pagerank_topk as _pr
    from lucenenet_spark.plans.gate import _docs_table

    return _pr(
        _docs_table(spark, sf_dir), k=_PR_K, damping=_PR_D, iterations=_PR_ITERS
    )


_SB_ALPHA = 0.4

_SB_SQL = f"""
WITH tr AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
ttok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM tr
),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM ttok GROUP BY w),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uni),
tp AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM tr),
       unnest(generate_series(1, len(t) - 1)) AS u(i)
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM tp GROUP BY w1, w2),
dp AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
       unnest(generate_series(1, len(t) - 1)) AS u(i)
),
scored AS (
  SELECT dp.doc_id,
         ln(CASE WHEN b.cb IS NOT NULL THEN b.cb / CAST(u1.cnt AS DOUBLE)
                 ELSE {_SB_ALPHA!r} * coalesce(u2.cnt, 1) / tot.total END) AS lp
  FROM dp
  LEFT JOIN big b ON b.w1 = dp.w1 AND b.w2 = dp.w2
  LEFT JOIN uni u1 ON u1.w = dp.w1
  LEFT JOIN uni u2 ON u2.w = dp.w2
  CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(floor(avg(lp) * 10000.0 + 0.5) AS BIGINT) AS avg_logprob_q
FROM scored GROUP BY doc_id
"""


_PPR_MOD = 10  # seed set: doc_id % 10 == 0


def _ppr_sql() -> str:
    """Personalized PageRank oracle: teleport vector restricted to the
    seed set (uniform 1/|S| over seeds, 0 elsewhere), same unrolled
    power iteration as the classic gate."""
    tele = 1.0 - _PR_D
    iters = []
    for k in range(1, _PR_ITERS + 1):
        iters.append(f"""
p{k} AS (
  SELECT t.doc_id,
         {tele!r} * t.tp + {_PR_D!r} * coalesce(c.m, 0.0) AS pr
  FROM tp t
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(r.pr / e.deg) AS m
    FROM edges e JOIN p{k - 1} r ON r.doc_id = e.src GROUP BY e.dst
  ) c USING (doc_id)
)""")
    return f"""
WITH {_GRAPH_CTES},
sc AS (SELECT CAST(count(*) AS BIGINT) AS s FROM nodes
       WHERE doc_id % {_PPR_MOD} = 0),
tp AS (
  SELECT nd.doc_id,
         CASE WHEN nd.doc_id % {_PPR_MOD} = 0 THEN 1.0 / sc.s
              ELSE 0.0 END AS tp
  FROM nodes nd CROSS JOIN sc
),
p0 AS (SELECT doc_id, tp AS pr FROM tp),{",".join(iters)}
SELECT doc_id,
       CAST(floor(pr * 10000000.0 + 0.5) AS BIGINT) AS rank_q
FROM p{_PR_ITERS}
ORDER BY rank_q DESC, doc_id ASC LIMIT {_PR_K}
"""


@gate("personalized_pagerank", _ppr_sql())
def personalized_pagerank(spark, sf_dir):
    """Personalized/Topic-Sensitive PageRank (Haveliwala WWW'02, also
    the TrustRank seed-propagation shape): teleport mass lands only on
    the doc_id % 10 == 0 seed set, so rank measures proximity to the
    seeds through the link graph. Same 5-iteration loop and oracle as
    pagerank_topk with the seeded teleport vector."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, pagerank
    from lucenenet_spark.plans.gate import _docs_table

    nodes = _docs_table(spark, sf_dir).select("doc_id")
    seeds = nodes.filter(F.col("doc_id") % _PPR_MOD == 0)
    s_cnt = seeds.agg(F.count(F.lit(1)).cast("long").alias("_s"))
    teleport = seeds.crossJoin(F.broadcast(s_cnt)).select(
        "doc_id", (F.lit(1.0) / F.col("_s")).alias("tp")
    )
    pr = pagerank(
        nodes, build_link_graph(nodes), damping=_PR_D,
        iterations=_PR_ITERS, teleport=teleport,
    )
    return (
        pr.select(
            "doc_id",
            F.floor(F.col("pr") * F.lit(10000000.0) + F.lit(0.5))
            .cast("long")
            .alias("rank_q"),
        )
        .orderBy(F.col("rank_q").desc(), F.col("doc_id").asc())
        .limit(_PR_K)
    )


_HITS_ITERS = 3


def _hits_sql() -> str:
    """HITS oracle: unrolled hub/authority half-steps, each L1-normalized
    by the sum of its RAW contribution rows (pre-coalesce, matching the
    Spark aggregation exactly)."""
    steps = []
    for k in range(1, _HITS_ITERS + 1):
        steps.append(f"""
a{k}r AS (
  SELECT e.dst AS doc_id, sum(h.h) AS a
  FROM edges e JOIN h{k - 1} h ON h.doc_id = e.src GROUP BY e.dst
),
a{k}s AS (SELECT sum(a) AS s FROM a{k}r),
a{k} AS (
  SELECT nd.doc_id, coalesce(r.a, 0.0) / s.s AS a
  FROM nodes nd LEFT JOIN a{k}r r USING (doc_id) CROSS JOIN a{k}s s
),
h{k}r AS (
  SELECT e.src AS doc_id, sum(a.a) AS hr
  FROM edges e JOIN a{k} a ON a.doc_id = e.dst GROUP BY e.src
),
h{k}s AS (SELECT sum(hr) AS s FROM h{k}r),
h{k} AS (
  SELECT nd.doc_id, coalesce(r.hr, 0.0) / s.s AS h
  FROM nodes nd LEFT JOIN h{k}r r USING (doc_id) CROSS JOIN h{k}s s
)""")
    return f"""
WITH {_GRAPH_CTES},
h0 AS (SELECT doc_id, 1.0 AS h FROM nodes),{",".join(steps)}
SELECT a{_HITS_ITERS}.doc_id,
       CAST(floor(a{_HITS_ITERS}.a * 10000000.0 + 0.5) AS BIGINT) AS auth_q,
       CAST(floor(h{_HITS_ITERS}.h * 10000000.0 + 0.5) AS BIGINT) AS hub_q
FROM a{_HITS_ITERS} JOIN h{_HITS_ITERS} USING (doc_id)
ORDER BY auth_q DESC, doc_id ASC LIMIT {_PR_K}
"""


@gate("hits_topk", _hits_sql())
def hits_topk(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg JACM'99): 3 power iterations
    from the all-ones hub vector over the synthetic link graph, each
    half-step L1-normalized. Top-20 by quantized authority (doc-id
    tie-break) with both scores oracle-checked."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, hits
    from lucenenet_spark.plans.gate import _docs_table

    nodes = _docs_table(spark, sf_dir).select("doc_id")
    hv = hits(nodes, build_link_graph(nodes), iterations=_HITS_ITERS)
    return (
        hv.select(
            "doc_id",
            F.floor(F.col("a") * F.lit(10000000.0) + F.lit(0.5))
            .cast("long")
            .alias("auth_q"),
            F.floor(F.col("h") * F.lit(10000000.0) + F.lit(0.5))
            .cast("long")
            .alias("hub_q"),
        )
        .orderBy(F.col("auth_q").desc(), F.col("doc_id").asc())
        .limit(_PR_K)
    )


# ==========================================================================
# Phonetic wave 2: NYSIIS + Caverphone 2.0 replace-mode analyzers
# (Analysis.Phonetic/Language/{Nysiis,Caverphone2}.cs semantics) — same
# key-merged-postings shape as the soundex gate: every term becomes its
# phonetic key at index AND query time, the oracle re-derives the keyed
# postings through a closed-vocabulary CASE map.
# ==========================================================================
_PHON2_ENGINE: dict[tuple, tuple] = {}


def _get_engine_phon2(spark, sf_dir, encoder: str):
    import os as _os

    from lucenenet_spark.analysis.phonetic import PhoneticAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    key = (_os.path.abspath(sf_dir), encoder)
    if key not in _PHON2_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(
            docs.select("doc_id", "text"), analyzer=PhoneticAnalyzer(encoder)
        ).cache()
        _PHON2_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    return _PHON2_ENGINE[key]


def _phon2_sql(encode_fn, query_word: str) -> str:
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB
    from lucenenet_spark.plans.gate_round5 import _case_over

    case = _case_over((w, encode_fn(w)) for w in _CORPUS_VOCAB)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tokf AS (
  SELECT doc_id, {case} AS term
  FROM tok WHERE term <> ''
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = '{encode_fn(query_word)}'
"""


def _dm_inject_sql(query_word: str) -> str:
    """Inject-mode oracle: postings are the UNION of originals, primary
    codes (where they differ from the token), and alternate codes (where
    they differ from the primary AND the primary differed) — while
    doc length and total-token stats count ORIGINALS only
    (discountOverlaps), exactly the engine's field_lens contract."""
    from lucenenet_spark.analysis.double_metaphone import double_metaphone
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB
    from lucenenet_spark.plans.gate_round5 import _case_over

    pairs = {w: double_metaphone(w) for w in _CORPUS_VOCAB}
    pcase = _case_over((w, p.lower()) for w, (p, _) in pairs.items())
    acase = _case_over((w, a.lower()) for w, (_, a) in pairs.items())
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
),
tokf AS (SELECT doc_id, term FROM tok WHERE term <> ''),
keys AS (
  SELECT doc_id, term AS t, {pcase} AS p, {acase} AS a FROM tokf
),
allterms AS (
  SELECT doc_id, t AS term FROM keys
  UNION ALL
  SELECT doc_id, p AS term FROM keys WHERE p <> t AND p <> ''
  UNION ALL
  SELECT doc_id, a AS term FROM keys WHERE a <> p AND a <> '' AND p <> t
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM allterms GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor((ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term = '{double_metaphone(query_word)[0].lower()}'
"""


_DM_INJ_ENGINE: dict[str, tuple] = {}


@gate("dm_inject_term", _dm_inject_sql("merge"))
def dm_inject_term(spark, sf_dir):
    """TermQuery over a DoubleMetaphoneAnalyzer(inject=True) index —
    the DoubleMetaphoneFilter.cs emission contract driver-verified:
    originals stay searchable at posIncr >= 1, primary + distinct
    alternate codes overlap at posIncr 0, norms count originals only."""
    import os as _os

    from lucenenet_spark.analysis.phonetic import DoubleMetaphoneAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _DM_INJ_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(
            docs.select("doc_id", "text"),
            analyzer=DoubleMetaphoneAnalyzer(inject=True),
        ).cache()
        _DM_INJ_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    _, s = _DM_INJ_ENGINE[key]
    return _spark_score_q(s.scored(TermQuery(_dm_lc("merge"))))


def _dmsx(w):
    from lucenenet_spark.analysis.dm_soundex import dm_soundex

    return dm_soundex(w)


@gate("dm_soundex_term", _phon2_sql(_dmsx, "merge"))
def dm_soundex_term(spark, sf_dir):
    """TermQuery(dm_soundex('merge')) over a PhoneticAnalyzer
    ('dm_soundex') replace-mode index — Daitch-Mokotoff Soundex
    retrieval (Avotaynu standard, Language/DaitchMokotoffSoundex.cs,
    validated on the reference's golden vectors incl. the branching
    code sets) with BM25 over key-merged postings."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _get_engine_phon2(spark, sf_dir, "dm_soundex")
    return _spark_score_q(s.scored(TermQuery(_dmsx("merge"))))


def _nysiis_lc(w):
    from lucenenet_spark.analysis.phonetic import nysiis

    return nysiis(w).lower()


def _caver_lc(w):
    from lucenenet_spark.analysis.phonetic import caverphone2

    return caverphone2(w).lower()


def _metaphone_lc(w):
    from lucenenet_spark.analysis.phonetic import metaphone

    return metaphone(w).lower()


@gate("metaphone_term_query", _phon2_sql(_metaphone_lc, "merge"))
def metaphone_term_query(spark, sf_dir):
    """TermQuery(metaphone('merge')) over a PhoneticAnalyzer('metaphone')
    replace-mode index — Metaphone-class retrieval (Philips 1990,
    Language/Metaphone.cs, validated on the reference's 40 golden
    vectors in tests) with BM25 over key-merged postings."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _get_engine_phon2(spark, sf_dir, "metaphone")
    return _spark_score_q(s.scored(TermQuery(_metaphone_lc("merge"))))


def _dm_lc(w):
    from lucenenet_spark.analysis.double_metaphone import double_metaphone

    return double_metaphone(w)[0].lower()


@gate("double_metaphone_term", _phon2_sql(_dm_lc, "merge"))
def double_metaphone_term(spark, sf_dir):
    """TermQuery(double_metaphone('merge').primary) over a
    PhoneticAnalyzer('double_metaphone') replace-mode index — Double
    Metaphone retrieval (Philips 2000, Language/DoubleMetaphone.cs,
    validated on the reference's golden vectors incl. the
    primary/alternate split) with BM25 over key-merged postings."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _get_engine_phon2(spark, sf_dir, "double_metaphone")
    return _spark_score_q(s.scored(TermQuery(_dm_lc("merge"))))


@gate("nysiis_term_query", _phon2_sql(_nysiis_lc, "merge"))
def nysiis_term_query(spark, sf_dir):
    """TermQuery(nysiis('merge')) over a PhoneticAnalyzer('nysiis')
    replace-mode index — NYSIIS-class retrieval (Taft 1970 rules, the
    Language/Nysiis.cs rule set validated against the reference's own
    golden vectors in tests) with BM25 over key-merged postings."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _get_engine_phon2(spark, sf_dir, "nysiis")
    return _spark_score_q(s.scored(TermQuery(_nysiis_lc("merge"))))


@gate("caverphone_term_query", _phon2_sql(_caver_lc, "merge"))
def caverphone_term_query(spark, sf_dir):
    """TermQuery(caverphone2('merge')) over a
    PhoneticAnalyzer('caverphone2') replace-mode index — Caverphone 2.0
    class retrieval (Hood 2004 cascade, Language/Caverphone2.cs)
    with BM25 over key-merged postings."""
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import TermQuery

    _, s = _get_engine_phon2(spark, sf_dir, "caverphone2")
    return _spark_score_q(s.scored(TermQuery(_caver_lc("merge"))))


# ==========================================================================
# WET content-source round trip (Common Crawl conversion records; the
# linedoc_roundtrip shape with the ISO 28500 WARC format)
# ==========================================================================
_WET_DIR: dict[str, str] = {}


@gate("wet_roundtrip", "SELECT doc_id, text FROM documents")
def wet_roundtrip(spark, sf_dir):
    """Write the corpus as WARC/WET conversion records (one record per
    doc, Content-Length-exact), read it back through the file-parallel
    WET parser, and recover (doc_id, text) byte-identically — the
    web-crawl analogue of the reference's content-source round trips
    (ByTask/Feeds/*ContentSource.cs)."""
    import os as _os
    import tempfile

    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.sources.warc import read_wet, write_wet

    docs = _docs_table(spark, sf_dir)
    key = _os.path.abspath(sf_dir)
    if key not in _WET_DIR:
        path = _os.path.join(tempfile.mkdtemp(prefix="wet_gate_"), "corpus.wet")
        write_wet(
            docs.select(
                F.concat(F.lit("http://example.com/doc/"), F.col("doc_id"))
                .alias("uri"),
                "text",
            ),
            path,
        )
        _WET_DIR[key] = path
    back = read_wet(spark, _WET_DIR[key])
    return back.select(
        F.regexp_extract("uri", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
    )


# ==========================================================================
# Scandinavian normalization+folding and hyphenated-word reassembly
# (Analysis/Miscellaneous/{ScandinavianNormalizationFilter,
# ScandinavianFoldingFilter,HyphenatedWordsFilter}.cs) — corrupt the raw
# text deterministically, let the filter chain restore it, score against
# the UNMODIFIED-corpus oracle (the pattern_replace_term gate shape).
# ==========================================================================
def _or3_sql(terms: tuple[str, ...]) -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED

    inlist = ", ".join(f"'{t}'" for t in terms)
    return (
        SQL_PRELUDE
        + ","
        + _SQL_SCORED
        + f"""
SELECT doc_id,
       CAST(floor(sum(idf * 2.2 * tf / (tf + nrm)) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM sc WHERE term IN ({inlist}) GROUP BY doc_id
"""
    )


_SCAN_ENGINE: dict[str, tuple] = {}


@gate("scandinavian_fold_term", _or3_sql(("value", "batch", "data")))
def scandinavian_fold_term(spark, sf_dir):
    """value/batch/data are corrupted in the raw text to vælue (æ
    ligature: fold), bätch (Swedish umlaut: normalize ä->æ then fold),
    dåta (å: fold); the ScandinavianFoldingAnalyzer chain restores all
    three, so BM25 for the OR query equals the unmodified-corpus
    oracle — both filters verified end-to-end in one index."""
    import os as _os

    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.misc_filters import ScandinavianFoldingAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _SCAN_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        corrupted = docs.select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", "value", "vælue"),
                    "batch", "bätch",
                ),
                "data", "dåta",
            ).alias("text"),
        )
        idx = build_index(
            corrupted, analyzer=ScandinavianFoldingAnalyzer()
        ).cache()
        _SCAN_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    _, s = _SCAN_ENGINE[key]
    q = BooleanQuery.of(
        (TermQuery("value"), Occur.SHOULD),
        (TermQuery("batch"), Occur.SHOULD),
        (TermQuery("data"), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


_HYPH_ENGINE: dict[str, tuple] = {}


@gate("hyphenated_words_term", _or3_sql(("customer", "window", "stream")))
def hyphenated_words_term(spark, sf_dir):
    """customer/window/stream are split in the raw text as line-break
    hyphenation ('cus- tomer', 'win- dow', 'str- e- am' — the last a
    transitive chain); HyphenatedWordsAnalyzer reassembles them, so
    BM25 for the OR query equals the unmodified-corpus oracle."""
    import os as _os

    from pyspark.sql import functions as F

    from lucenenet_spark.analysis.misc_filters import HyphenatedWordsAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _HYPH_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        corrupted = docs.select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", "customer", "cus- tomer"),
                    "window", "win- dow",
                ),
                "stream", "str- e- am",
            ).alias("text"),
        )
        idx = build_index(corrupted, analyzer=HyphenatedWordsAnalyzer()).cache()
        _HYPH_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    _, s = _HYPH_ENGINE[key]
    q = BooleanQuery.of(
        (TermQuery("customer"), Occur.SHOULD),
        (TermQuery("window"), Occur.SHOULD),
        (TermQuery("stream"), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


_SQ8_SHORT = 50
_SQ8_K = 10
_SQ8_QID = 0
_SQ8_QUERY: dict[str, list] = {}


def _sq8_query(spark, sf_dir):
    import os as _os

    from pyspark.sql import functions as F

    key = _os.path.abspath(sf_dir)
    if key not in _SQ8_QUERY:
        emb = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet"))
        row = emb.filter(F.col("vec_id") == _SQ8_QID).collect()[0]
        _SQ8_QUERY[key] = [float(x) for x in row["embedding"]]
    return _SQ8_QUERY[key]


def _sq8_sql() -> str:
    """SQ8 oracle, SF-agnostic: the query vector (vec_id 0) is derived
    and quantized IN SQL with the identical floor(x*(127/max|x|)+0.5)
    arithmetic the Spark/driver side uses — corpus quantization,
    all-integer shortlist cosine, then exact double re-rank."""
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
qv AS (
  SELECT vec_id, v,
         list_transform(v, x -> CAST(floor(
           x * (127.0 / greatest(list_max(list_transform(v, y -> abs(y))), 1e-30))
           + 0.5) AS BIGINT)) AS q
  FROM raw
),
eq AS (
  SELECT vec_id, unnest(q) AS qi, generate_subscripts(q, 1) AS i FROM qv
),
ql AS (
  SELECT unnest(q) AS qi, generate_subscripts(q, 1) AS i
  FROM qv WHERE vec_id = {_SQ8_QID}
),
qn2 AS (SELECT CAST(sum(qi * qi) AS BIGINT) AS n2 FROM ql),
d AS (
  SELECT eq.vec_id,
         CAST(sum(eq.qi * ql.qi) AS BIGINT) AS dq,
         CAST(sum(eq.qi * eq.qi) AS BIGINT) AS n2
  FROM eq JOIN ql USING (i) GROUP BY eq.vec_id
),
short AS (
  SELECT d.vec_id,
         CAST(floor(dq / sqrt(CAST(d.n2 AS DOUBLE) * CAST(qn2.n2 AS DOUBLE))
                    * 10000.0 + 0.5) AS BIGINT) AS cos8_q
  FROM d, qn2 ORDER BY cos8_q DESC, d.vec_id ASC LIMIT {_SQ8_SHORT}
),
er AS (
  SELECT r.vec_id, unnest(r.v) AS x, generate_subscripts(r.v, 1) AS i
  FROM raw r JOIN short ON short.vec_id = r.vec_id
),
qe AS (
  SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i
  FROM raw WHERE vec_id = {_SQ8_QID}
),
cosd AS (
  SELECT er.vec_id, sum(er.x * qe.x) AS dot, sum(er.x * er.x) AS n2
  FROM er JOIN qe USING (i) GROUP BY er.vec_id
),
qn AS (SELECT sum(x * x) AS n2 FROM qe)
SELECT s.vec_id, s.cos8_q,
       CAST(floor(cosd.dot / sqrt(cosd.n2 * qn.n2) * 10000.0 + 0.5) AS BIGINT)
         AS cos_q
FROM short s JOIN cosd USING (vec_id), qn
ORDER BY cos_q DESC, s.vec_id ASC LIMIT {_SQ8_K}
"""


@gate("ann_sq8_topk", _sq8_sql())
def ann_sq8_topk(spark, sf_dir):
    """SQ8 scalar-quantized ANN (the FAISS QT_8bit shape): per-vector
    symmetric int8 codes, all-integer shortlist cosine (the per-vector
    scales cancel out of sum(qa*qb)/sqrt(sum qa^2 * sum qb^2)), exact
    float re-rank of the top-50 — completing the ANN family
    brute/hyperplane-LSH/IVF/PQ-ADC/IVFADC/SQ8. Both stages
    oracle-checked (shortlist metric integer-exact)."""
    import os as _os

    from lucenenet_spark.functions.similarity import sq8_ann_topk

    emb = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet"))
    return sq8_ann_topk(
        emb, _sq8_query(spark, sf_dir), n_shortlist=_SQ8_SHORT, k=_SQ8_K
    )


_IVJ_SQL = """
SELECT l.user_id,
       l.event_id AS l_id,
       r.event_id AS r_id,
       CAST(date_diff('microsecond', l.ts, r.ts) AS BIGINT) AS gap_micros
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND r.ts > l.ts
 AND r.ts <= l.ts + INTERVAL 5 MINUTE
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
"""


@gate("stream_interval_join", _IVJ_SQL)
def stream_interval_join(spark, sf_dir):
    """Event-time interval join (click -> purchase attribution within 5
    minutes per user): the stream-stream join plan run in batch mode
    against the plain self-join oracle. The streaming twin
    (watermarked both sides, state bounded by the time-range predicate)
    is byte-compared to this batch plan in tests/test_streaming_windows.py."""
    import os as _os

    from pyspark.sql import functions as F

    from lucenenet_spark.streaming.windows import interval_join

    ev = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))
    return interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        upper_minutes=5,
    )


def _kwrepeat_sql() -> str:
    """KeywordRepeat inject oracle: postings = surface tokens UNION
    Porter stems where they differ (RemoveDuplicates drops the equal
    case), doc length and totals count SURFACE tokens only
    (discountOverlaps) — then the standard BM25 OR over the exact term
    and the stem. English stop set applies before the repeat, matching
    the analyzer chain."""
    from lucenenet_spark.analysis.porter import porter_stem
    from lucenenet_spark.plans.gate import _STOPS
    from lucenenet_spark.plans.gate_modules import _CORPUS_VOCAB
    from lucenenet_spark.plans.gate_round5 import _case_over

    scase = _case_over((w, porter_stem(w)) for w in _CORPUS_VOCAB)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tokf AS (
  SELECT doc_id, term FROM tok
  WHERE term <> '' AND term NOT IN ({_STOPS})
),
keys AS (SELECT doc_id, term AS t, {scase} AS s FROM tokf),
allterms AS (
  SELECT doc_id, t AS term FROM keys
  UNION ALL
  SELECT doc_id, s AS term FROM keys WHERE s <> t AND s <> ''
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM allterms GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM documents d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
)
SELECT p.doc_id,
       CAST(floor(sum(ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.tf
             / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n)))) * 10000 + 0.5) AS BIGINT)
         AS score_q
FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
WHERE p.term IN ('merge', '{porter_stem("merge")}')
GROUP BY p.doc_id
"""


_KWR_ENGINE: dict[str, tuple] = {}


@gate("keyword_repeat_stem", _kwrepeat_sql())
def keyword_repeat_stem(spark, sf_dir):
    """KeywordRepeatFilter -> PorterStemFilter -> RemoveDuplicates: the
    exact surface term and its Porter stem coexist at the same position
    (norms count surface tokens only), so OR('merge', stem) scores both
    the exact and the stem-class postings — the Lucene recipe for
    exact+stemmed retrieval in one field, driver-verified."""
    import os as _os

    from lucenenet_spark.analysis.misc_filters import KeywordRepeatStemAnalyzer
    from lucenenet_spark.analysis.porter import porter_stem
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _spark_score_q
    from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    key = _os.path.abspath(sf_dir)
    if key not in _KWR_ENGINE:
        docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
        idx = build_index(
            docs.select("doc_id", "text"), analyzer=KeywordRepeatStemAnalyzer()
        ).cache()
        _KWR_ENGINE[key] = (idx, IndexSearcher(idx, mode="double"))
    _, s = _KWR_ENGINE[key]
    q = BooleanQuery.of(
        (TermQuery("merge"), Occur.SHOULD),
        (TermQuery(porter_stem("merge")), Occur.SHOULD),
    )
    return _spark_score_q(s.scored(q))


_TC_N = 40

_TEXTCAT_SQL = f"""
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
padded AS (
  SELECT doc_id, lang, '_' || w || '_' AS pw FROM words WHERE w <> ''
),
grams AS (
  SELECT doc_id, lang, substr(pw, i, 2) AS g
  FROM padded, unnest(generate_series(1, length(pw) - 1)) AS u(i)
  UNION ALL
  SELECT doc_id, lang, substr(pw, i, 3) AS g
  FROM padded, unnest(generate_series(1, length(pw) - 2)) AS u(i)
),
lc AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt FROM grams
  WHERE doc_id % 2 = 0 GROUP BY lang, g
),
lp AS (
  SELECT lang, g, lr FROM (
    SELECT lang, g,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, g ASC) AS lr
    FROM lc
  ) WHERE lr <= {_TC_N}
),
dc AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt FROM grams
  GROUP BY doc_id, g
),
dp AS (
  SELECT doc_id, g, dr FROM (
    SELECT doc_id, g,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS dr
    FROM dc
  ) WHERE dr <= {_TC_N}
),
langs AS (SELECT DISTINCT lang FROM lp),
scored AS (
  SELECT dp.doc_id, l.lang,
         CAST(sum(coalesce(abs(dp.dr - lp.lr), {_TC_N})) AS BIGINT) AS dist
  FROM dp CROSS JOIN langs l
  LEFT JOIN lp ON lp.lang = l.lang AND lp.g = dp.g
  GROUP BY dp.doc_id, l.lang
)
SELECT doc_id, lang AS lang_pred, dist
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY dist ASC, lang ASC
  ) AS rn FROM scored
) WHERE rn = 1
"""


@gate("textcat_langid", _TEXTCAT_SQL)
def textcat_langid(spark, sf_dir):
    """TextCat language ID (Cavnar & Trenkle 1994): top-40 padded char
    2/3-gram rank profiles trained on the even-doc-id half's lang
    labels, every document classified by exact-integer out-of-place
    distance (penalty 40, total-order tie-breaks). Upgrades the
    stopword-ratio heuristic gate to the published algorithm. Note the
    synthetic corpus shares one token vocabulary across its lang
    labels, so label-recovery accuracy here is near chance BY DESIGN —
    the gate checks algorithmic parity; real-language separation is
    shown by the en/de pytest twin (100%)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.textcat import textcat_classify
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    return textcat_classify(docs, train, top_n=_TC_N)


_CCNET_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tokf AS (SELECT doc_id, w FROM tok WHERE w <> ''),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tokf GROUP BY w),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq),
stats AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(floor(avg(ln(f.cnt / tot.total)) * 10000 + 0.5) AS BIGINT)
           AS avg_logprob_q
  FROM tokf t JOIN freq f USING (w), tot
  GROUP BY t.doc_id
)
SELECT d.doc_id, d.lang, s.n_tokens, s.avg_logprob_q,
       CAST(ntile(3) OVER (
         PARTITION BY d.lang
         ORDER BY s.avg_logprob_q DESC, d.doc_id ASC
       ) AS BIGINT) AS bucket
FROM documents d JOIN stats s USING (doc_id)
"""


@gate("ccnet_lm_buckets", _CCNET_SQL)
def ccnet_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail split (Wenzek et al. 2020): per-language
    equal-frequency tertiles over the corpus-unigram LM score with a
    total order (score desc, doc_id), so head/middle/tail membership is
    deterministic. Docs too short to score are absent, as in
    lm_unigram_quality."""
    from lucenenet_spark.functions.lm_quality import lm_buckets
    from lucenenet_spark.plans.gate import _docs_table

    return lm_buckets(_docs_table(spark, sf_dir), n_buckets=3)


@gate("bigram_lm_quality", _SB_SQL)
def bigram_lm_quality(spark, sf_dir):
    """Stupid-Backoff bigram LM scoring (Brants et al. EMNLP'07): the
    even-doc-id half of the corpus is the count model, every document is
    scored under it — unseen bigrams hit the alpha=0.4 unigram backoff
    and OOV unigrams score as hapax, so all three scoring branches are
    oracle-checked. Output is each doc's mean ln S over adjacent pairs,
    quantized 1e-4 (docs with <2 tokens are unscorable and absent)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.lm_quality import bigram_logprob
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    return bigram_logprob(docs, train=train, alpha=_SB_ALPHA)
