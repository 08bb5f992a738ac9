"""Round-3 gates: DFR/IB similarity family, suggesters, analyzer stages,
CommonTermsQuery, multimodal. Registered into gate.GATE_QUERIES like the
other gate_* modules; every entry carries a full DuckDB oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    gate,
    get_engine,
    _spark_score_q,
)
from lucenenet_spark.search.queries import TermQuery

# f32(f32(sttf)/N) — FillBasicStats avgFieldLength, as the pl2 gate pins it
_SQL_AVG = "CAST(CAST(cs.sttf AS FLOAT) / cs.n AS FLOAT)"


# ==========================================================================
# IB similarities (Search/Similarities/IBSimilarity.cs: score = boost *
# distribution(tfn, lambda); DistributionSPL.cs, DistributionLL.cs,
# LambdaTTF.cs/LambdaDF.cs; NormalizationH2.Tfn)
# ==========================================================================
@gate(
    "ib_spl_term",
    SQL_PRELUDE + """,
consts AS (SELECT """ + _SQL_AVG + """ AS avg, cs.n AS n FROM cs),
scored AS (
  SELECT p.doc_id,
         p.tf * log2(1 + 1.0 * consts.avg / dl.dl) AS tfn,
         CAST(CAST(ts.ttf + 1 AS FLOAT) / CAST(consts.n + 1 AS FLOAT) AS FLOAT) AS lam
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), consts
  WHERE p.term = 'vector'
)
SELECT doc_id,
       CAST(floor(
         (-ln((pow(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam)))
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM scored
""",
)
def ib_spl_term(spark, sf_dir):
    """TermQuery under IB SPL-L(TTF)-H2 (IBSimilarity.cs + DistributionSPL
    + LambdaTTF + NormalizationH2)."""
    from lucenenet_spark.search.dfr import DFRSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = DFRSearcher(idx, family="ib", distribution="spl", ib_lambda="ttf",
                    norm="h2", mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


@gate(
    "ib_ll_term",
    SQL_PRELUDE + """,
consts AS (SELECT """ + _SQL_AVG + """ AS avg, cs.n AS n FROM cs),
scored AS (
  SELECT p.doc_id,
         p.tf * consts.avg / dl.dl AS tfn,
         CAST(CAST(ts.df + 1 AS FLOAT) / CAST(consts.n + 1 AS FLOAT) AS FLOAT) AS lam
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), consts
  WHERE p.term = 'merge'
)
SELECT doc_id,
       CAST(floor((-ln(lam / (tfn + lam))) * 10000 + 0.5) AS BIGINT) AS score_q
FROM scored
""",
)
def ib_ll_term(spark, sf_dir):
    """TermQuery under IB LL-D(DF)-H1 (DistributionLL + LambdaDF +
    NormalizationH1)."""
    from lucenenet_spark.search.dfr import DFRSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = DFRSearcher(idx, family="ib", distribution="ll", ib_lambda="df",
                    norm="h1", mode="double")
    return _spark_score_q(s.scored(TermQuery("merge")))


# ==========================================================================
# DFR configs beyond PL2 (DFRSimilarity.cs: boost * basicModel * afterEffect)
# ==========================================================================
@gate(
    "dfr_ifb_term",
    SQL_PRELUDE + """
SELECT p.doc_id,
       CAST(floor(
         ((p.tf * CAST(log2(1 + (cs.n + 1) / (ts.ttf + 0.5)) AS FLOAT))
          * ((ts.ttf + 2.0) / ((ts.df + 1.0) * (p.tf + 1.0))))
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN ts USING (term), cs
WHERE p.term = 'vector'
""",
)
def dfr_ifb_term(spark, sf_dir):
    """TermQuery under DFR I(F)B with no normalization (BasicModelIF.cs +
    AfterEffectB.cs; the TestIFB configuration)."""
    from lucenenet_spark.search.dfr import DFRSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = DFRSearcher(idx, family="dfr", model="if", after_effect="b",
                    norm="none", mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


@gate(
    "dfr_ineb2_term",
    SQL_PRELUDE + """,
consts AS (SELECT """ + _SQL_AVG + """ AS avg, cs.n AS n FROM cs),
scored AS (
  SELECT p.doc_id,
         p.tf * log2(1 + 1.0 * consts.avg / dl.dl) AS tfn,
         CAST(log2((consts.n + 1)
                   / (consts.n * (1 - pow((consts.n - 1) / consts.n, ts.ttf)) + 0.5))
              AS FLOAT) AS inec,
         ts.ttf AS ttf, ts.df AS df
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), consts
  WHERE p.term = 'vector'
)
SELECT doc_id,
       CAST(floor(
         ((tfn * inec) * ((ttf + 2.0) / ((df + 1.0) * (tfn + 1.0))))
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM scored
""",
)
def dfr_ineb2_term(spark, sf_dir):
    """TermQuery under DFR IneB2 (BasicModelIne.cs + AfterEffectB.cs +
    NormalizationH2; the TestIneB2 configuration)."""
    from lucenenet_spark.search.dfr import DFRSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = DFRSearcher(idx, family="dfr", model="ine", after_effect="b",
                    norm="h2", mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# Suggest module (Suggest/Analyzing/AnalyzingSuggester.cs,
# Spell/WordBreakSpellChecker.cs)
# ==========================================================================
from lucenenet_spark.plans.gate import _STOPS  # noqa: E402


@gate(
    "analyzing_suggest",
    """
WITH ent AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface
    FROM documents
  ) GROUP BY surface
),
an AS (
  SELECT surface, weight,
         array_to_string(
           list_filter(string_split(surface, ' '),
                       x -> x <> '' AND x NOT IN (""" + _STOPS + """)),
           chr(31)) AS analyzed
  FROM ent
)
SELECT surface, weight FROM an
WHERE analyzed LIKE 'spark%'
ORDER BY (analyzed = 'spark') DESC, weight DESC, surface ASC
LIMIT 5
""",
)
def analyzing_suggest(spark, sf_dir):
    """AnalyzingSuggester over (first-two-token surface, popularity)
    entries: lookup('spark') must surface stopword-led forms like
    'the spark' (analyzed form drops the stopword) — the behavior raw
    prefix matching cannot express, exact analyzed match first."""
    from lucenenet_spark.search.suggest import AnalyzingSuggester

    _, _, docs = get_engine(spark, sf_dir)
    ent = (
        docs.select(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("surface")
        )
        .groupBy("surface")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    sug = AnalyzingSuggester(ent)  # StandardAnalyzer, preserve_sep, exact_first
    return sug.lookup("spark", 5)


@gate(
    "word_break_spell",
    SQL_PRELUDE + """,
splits AS (SELECT CAST(i AS INT) AS i FROM range(2, 8) t(i)),
pairs AS (
  SELECT substr('fastmerge', 1, i) AS left_w, substr('fastmerge', i + 1) AS right_w
  FROM splits
)
SELECT p.left_w, p.right_w, CAST(greatest(tl.df, tr.df) AS BIGINT) AS freq_max
FROM pairs p
JOIN ts tl ON tl.term = p.left_w
JOIN ts tr ON tr.term = p.right_w
ORDER BY freq_max DESC, left_w ASC
LIMIT 5
""",
)
def word_break_spell(spark, sf_dir):
    """WordBreakSpellChecker.SuggestWordBreaks('fastmerge') -> the
    dictionary split 'fast merge' (maxChanges=1, both halves df>=1)."""
    from lucenenet_spark.search.suggest import word_breaks

    idx, _, _ = get_engine(spark, sf_dir)
    return word_breaks(idx, "fastmerge", n=5, min_break_length=2)


@gate(
    "word_combine_spell",
    SQL_PRELUDE + """,
combos AS (SELECT * FROM (VALUES ('value'), ('uekey')) t(combined))
SELECT c.combined, CAST(ts.df AS BIGINT) AS freq
FROM combos c JOIN ts ON ts.term = c.combined
ORDER BY freq DESC, combined ASC
LIMIT 5
""",
)
def word_combine_spell(spark, sf_dir):
    """WordBreakSpellChecker.SuggestWordCombinations(['val','ue','key'])
    -> adjacent concatenation 'value' found in the dictionary."""
    from lucenenet_spark.search.suggest import word_combinations

    idx, _, _ = get_engine(spark, sf_dir)
    return word_combinations(idx, ["val", "ue", "key"], n=5)


# ==========================================================================
# UAX29URLEmailTokenizer subset + MappingCharFilter
# (Analysis/Standard/UAX29URLEmailTokenizer.cs, Analysis/CharFilter/
# MappingCharFilter.cs)
# ==========================================================================
from lucenenet_spark.plans.gate import _SQL_SCORED, _tsc  # noqa: E402

_DOCS2 = (
    "docs2 AS (SELECT doc_id, text || ' https://example' "
    "|| CAST(doc_id % 7 AS VARCHAR) || '.com/p' || CAST(doc_id % 13 AS VARCHAR) "
    "|| ' user' || CAST(doc_id % 5 AS VARCHAR) || '@mail.example' AS text "
    "FROM documents)"
)
# the standard prelude, re-rooted on the URL/email-augmented corpus
_PRELUDE_URL = SQL_PRELUDE.replace(
    "WITH tok AS", "WITH " + _DOCS2 + ",\ntok AS"
).replace("FROM documents\n", "FROM docs2\n").replace("FROM documents d", "FROM docs2 d")


@gate(
    "url_email_term",
    _PRELUDE_URL + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("https://example3.com/p7") + """)
""",
)
def url_email_term(spark, sf_dir):
    """BM25 TermQuery on a full-URL token: the UAX29URLEmail tokenizer
    must keep 'https://example3.com/p7' (and the e-mail token) whole —
    the standard tokenizer would shatter it and the term would not
    exist. dl shifts by the two injected tokens on BOTH sides."""
    from lucenenet_spark.analysis.analyzers import UAX29URLEmailAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    docs2 = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" https://example"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/p"), (F.col("doc_id") % 13).cast("string"),
            F.lit(" user"), (F.col("doc_id") % 5).cast("string"),
            F.lit("@mail.example"),
        ).alias("text"),
    )
    idx = build_index(docs2, analyzer=UAX29URLEmailAnalyzer())
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(TermQuery("https://example3.com/p7")))


@gate(
    "mapping_char_term",
    SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("merge") + """)
""",
)
def mapping_char_term(spark, sf_dir):
    """MappingCharFilter round-trip: hyphenate every 'merge' in the raw
    text, then index through MappingAnalyzer({'-': ''}) — the char filter
    must restore the original token stream, so BM25 for 'merge' matches
    the UNMODIFIED corpus oracle exactly (scores, dl, positions)."""
    from lucenenet_spark.analysis.analyzers import MappingAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    docs3 = docs.select(
        "doc_id", F.regexp_replace("text", "merge", "mer-ge").alias("text")
    )
    idx = build_index(docs3, analyzer=MappingAnalyzer({"-": ""}))
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(TermQuery("merge")))


# ==========================================================================
# Edge-ngram typeahead indexing (Analysis.Common/Analysis/NGram/
# EdgeNGramTokenFilter.cs) + CommonTermsQuery (Queries/CommonTermsQuery.cs)
# ==========================================================================
@gate(
    "edge_ngram_prefix",
    SQL_PRELUDE + """,
g AS (SELECT doc_id, term FROM tokf WHERE length(term) >= 2),
dlg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM g GROUP BY doc_id),
tfq AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM g WHERE length(term) >= 4 AND substr(term, 1, 4) = 'merg'
  GROUP BY doc_id
),
st AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM g) AS DOUBLE) AS sttf,
         CAST((SELECT count(*) FROM tfq) AS DOUBLE) AS df
)
SELECT t.doc_id,
       CAST(floor(
         (ln(1 + (st.n - st.df + 0.5) / (st.df + 0.5)) * 2.2 * t.tf
          / (t.tf + 1.2 * (0.25 + 0.75 * d.dl / (st.sttf / st.n))))
         * 10000 + 0.5) AS BIGINT) AS score_q
FROM tfq t JOIN dlg d USING (doc_id), st
""",
)
def edge_ngram_prefix(spark, sf_dir):
    """Typeahead from an edge-ngram-indexed field: prefix search becomes
    an exact TermQuery on the gram 'merg' (EdgeNGramAnalyzer 2..5).
    tf = tokens sharing the prefix; norm length counts each source token
    once (posIncr=0 grams discounted); avgdl follows sum(dl)/N."""
    from lucenenet_spark.analysis.analyzers import EdgeNGramAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    idx = build_index(docs, analyzer=EdgeNGramAnalyzer(min_gram=2, max_gram=5))
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(TermQuery("merg")))


@gate(
    "common_terms_query",
    SQL_PRELUDE + "," + _SQL_SCORED + """,
low AS (
  SELECT doc_id, sum(score) AS s FROM (
    (""" + _tsc("vector") + """) UNION ALL (""" + _tsc("key") + """)
  ) GROUP BY doc_id
),
high AS (
  SELECT doc_id, sum(score) AS s FROM (
    (""" + _tsc("scan") + """) UNION ALL (""" + _tsc("join") + """)
  ) GROUP BY doc_id
)
SELECT l.doc_id,
       CAST(floor((l.s + coalesce(h.s, 0.0)) * 10000 + 0.5) AS BIGINT) AS score_q
FROM low l LEFT JOIN high h USING (doc_id)
""",
)
def common_terms_query_gate(spark, sf_dir):
    """CommonTermsQuery(['scan','join','vector','key'], maxTermFrequency
    =0.78): at sf0.01 df(scan)=398, df(join)=394 > ceil(0.78*500)=390 >=
    df(vector)=382, df(key)=373 — high terms become a purely optional
    SHOULD sub-query, low terms the required one (cutoff pinned to the
    sf0.01 dictionary like the other data-derived gate constants)."""
    from lucenenet_spark.search.common_terms import common_terms_query

    _, s, _ = get_engine(spark, sf_dir)
    q = common_terms_query(s, ["scan", "join", "vector", "key"], max_term_frequency=0.78)
    return _spark_score_q(s.scored(q))


# ==========================================================================
# Multimodal binary-column plumbing (functions/multimodal.py): fake-decode
# gate — the deterministic sha256 feature is reproduced exactly in SQL
# ==========================================================================
_HEXV = "(strpos('0123456789abcdef', substr(h, {p}, 1)) - 1)"


def _le_u32_sql() -> str:
    """First 4 bytes of the hex sha256 digest as a little-endian uint32."""
    def byte(i: int) -> str:
        hi = _HEXV.format(p=2 * i + 1)
        lo = _HEXV.format(p=2 * i + 2)
        return f"(({hi}) * 16 + ({lo}))"
    return " + ".join(f"({byte(i)} * {256 ** i})" for i in range(4))


@gate(
    "media_features",
    """
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents
)
SELECT media_id,
       CAST(n_bytes AS INT) AS n_bytes,
       CAST(floor(CAST(CAST((""" + _le_u32_sql() + """) AS DOUBLE) / 4294967296.0 AS FLOAT)
                  * 10000 + 0.5) AS BIGINT) AS feat0_q
FROM m
""",
)
def media_features(spark, sf_dir):
    """Binary-column decode plumbing: text bytes ride as an opaque binary
    payload; extract_features (Arrow-batched mapInPandas, deterministic
    sha256 fake decoder — real codecs absent in this container) yields
    (media_id, n_bytes, feature[16]); feature[0] = f32(LE-uint32(sha256
    [:4]) / 2^32), reproduced bit-for-bit by the SQL oracle."""
    from lucenenet_spark.functions.multimodal import extract_features

    _, _, docs = get_engine(spark, sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    feats = extract_features(media, dim=16)
    return feats.select(
        "media_id",
        "n_bytes",
        F.floor(F.element_at("feature", 1).cast("double") * F.lit(10000.0) + F.lit(0.5))
        .cast("long")
        .alias("feat0_q"),
    )


# ==========================================================================
# 3-term sloppy phrase — full PhraseFreq state machine as a recursive CTE
# (SloppyPhraseScorer.cs:103-146; closes the n=2-only oracle gap).
# State per doc: hand slot h, slot positions p0..p2, end, matchLength,
# accumulated freq*60 (exact: slop=2 -> contributions in {60,30,20}).
# One recursion step = one advance of the in-hand PhrasePositions; the
# queue head is recomputed from state ((pos, offset) order, offsets
# 0<1<2). h=-1 marks the exhaustion row (final matchLength scored).
# ==========================================================================
_SLOPPY3_W = "WHEN 0 THEN 60 WHEN 1 THEN 30 WHEN 2 THEN 20"


@gate(
    "phrase_sloppy3",
    SQL_PRELUDE.replace("WITH tok", "WITH RECURSIVE tok", 1) + """,
pa AS (SELECT doc_id, pos - 0 AS v FROM tok WHERE term = 'key'),
pb AS (SELECT doc_id, pos - 1 AS v FROM tok WHERE term = 'agg'),
pc AS (SELECT doc_id, pos - 2 AS v FROM tok WHERE term = 'row'),
init AS (
  SELECT a.doc_id, a.m AS p0, b.m AS p1, c.m AS p2,
         greatest(a.m, b.m, c.m) AS endp
  FROM (SELECT doc_id, min(v) AS m FROM pa GROUP BY doc_id) a
  JOIN (SELECT doc_id, min(v) AS m FROM pb GROUP BY doc_id) b USING (doc_id)
  JOIN (SELECT doc_id, min(v) AS m FROM pc GROUP BY doc_id) c USING (doc_id)
),
init2 AS (
  SELECT doc_id,
         CASE WHEN p0 <= p1 AND p0 <= p2 THEN 0 WHEN p1 <= p2 THEN 1 ELSE 2 END AS h,
         p0, p1, p2, endp,
         endp - (CASE WHEN p0 <= p1 AND p0 <= p2 THEN p0 WHEN p1 <= p2 THEN p1 ELSE p2 END) AS ml,
         0 AS f60
  FROM init
),
walk(doc_id, h, p0, p1, p2, endp, ml, f60) AS (
  SELECT doc_id, h, p0, p1, p2, endp, ml, f60 FROM init2
  UNION ALL
  SELECT doc_id,
         CASE WHEN np IS NULL THEN -1
              WHEN NOT overtake THEN h
              WHEN q0 <= q1 AND q0 <= q2 THEN 0
              WHEN q1 <= q2 THEN 1 ELSE 2 END,
         q0, q1, q2,
         CASE WHEN np IS NULL THEN endp ELSE end2 END,
         CASE WHEN np IS NULL THEN ml
              WHEN NOT overtake THEN least(ml, end2 - np)
              ELSE end2 - (CASE WHEN q0 <= q1 AND q0 <= q2 THEN q0
                                WHEN q1 <= q2 THEN q1 ELSE q2 END) END,
         f60 + CASE WHEN (np IS NULL OR overtake) AND ml <= 2
                    THEN (CASE ml """ + _SLOPPY3_W + """ ELSE 0 END) ELSE 0 END
  FROM (
    SELECT s1.*,
           greatest(endp, np) AS end2,
           CASE WHEN s1.h = 0 THEN np ELSE p0 END AS q0,
           CASE WHEN s1.h = 1 THEN np ELSE p1 END AS q1,
           CASE WHEN s1.h = 2 THEN np ELSE p2 END AS q2,
           np > (CASE s1.h WHEN 0 THEN (CASE WHEN p1 <= p2 THEN p1 ELSE p2 END)
                           WHEN 1 THEN (CASE WHEN p0 <= p2 THEN p0 ELSE p2 END)
                           ELSE (CASE WHEN p0 <= p1 THEN p0 ELSE p1 END) END) AS overtake
    FROM (
      SELECT w.*,
             CASE w.h WHEN 0 THEN (SELECT min(v) FROM pa WHERE pa.doc_id = w.doc_id AND v > w.p0)
                      WHEN 1 THEN (SELECT min(v) FROM pb WHERE pb.doc_id = w.doc_id AND v > w.p1)
                      ELSE (SELECT min(v) FROM pc WHERE pc.doc_id = w.doc_id AND v > w.p2) END AS np
      FROM walk w WHERE w.h >= 0
    ) s1
  ) s2
)
SELECT doc_id, CAST(f60 AS BIGINT) AS freq60 FROM walk WHERE h = -1 AND f60 > 0
""",
)
def phrase_sloppy3(spark, sf_dir):
    """Sloppy phrase "key agg row"~2: 3-term sloppyFreq*60 (exact ints),
    engine = faithful PhraseFreq walk, oracle = the same state machine as
    a recursive CTE."""
    from lucenenet_spark.search.queries import PhraseQuery

    _, s, _ = get_engine(spark, sf_dir)
    freqs = s.sloppy_phrase_freqs(PhraseQuery(terms=("key", "agg", "row"), slop=2))
    return freqs.select(
        "doc_id",
        F.floor(F.col("freq") * F.lit(60.0) + F.lit(0.5)).cast("long").alias("freq60"),
    )


# ==========================================================================
# Facet associations + sampling (Lucene.Net.Facet/Taxonomy/
# TaxonomyFacetSumValueSource.cs, RandomSamplingFacetsCollector.cs)
# ==========================================================================
@gate(
    "facet_sum_assoc",
    SQL_PRELUDE + """
SELECT d.source AS source, CAST(sum(d.n_chars) AS BIGINT) AS assoc_sum
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'vector') m
JOIN documents d USING (doc_id)
GROUP BY d.source
""",
)
def facet_sum_assoc(spark, sf_dir):
    """Sum-int association facets: per source, sum of n_chars over docs
    matching TermQuery('vector')."""
    from lucenenet_spark.search.collectors import facet_sum_association

    _, s, docs = get_engine(spark, sf_dir)
    out = facet_sum_association(s, TermQuery("vector"), docs, "source", "n_chars")
    return out.select("source", F.col("assoc_sum").cast("long"))


@gate(
    "facet_sampled",
    SQL_PRELUDE + """
SELECT d.source AS source,
       CAST(floor(count(*) * 100.0 / 20 + 0.5) AS BIGINT) AS est_cnt
FROM (SELECT DISTINCT doc_id FROM post WHERE term = 'vector') m
JOIN documents d USING (doc_id)
WHERE (m.doc_id % 2147483648) * 2654435761 % 100 < 20
GROUP BY d.source
""",
)
def facet_sampled(spark, sf_dir):
    """Sampled facet counts (deterministic 20% multiplicative-hash sample,
    scaled x5) over docs matching TermQuery('vector')."""
    from lucenenet_spark.search.collectors import sampled_facet_counts

    _, s, docs = get_engine(spark, sf_dir)
    return sampled_facet_counts(s, TermQuery("vector"), docs, "source", percent=20)


# ==========================================================================
# Remaining suggesters: infix, fuzzy, free-text n-gram LM
# (Suggest/Analyzing/{AnalyzingInfixSuggester,FuzzySuggester,
# FreeTextSuggester}.cs)
# ==========================================================================
@gate(
    "infix_suggest",
    """
WITH ent AS (
  SELECT surface, CAST(count(*) AS BIGINT) AS weight FROM (
    SELECT array_to_string(string_split(text, ' ')[1:2], ' ') AS surface
    FROM documents
  ) GROUP BY surface
),
an AS (
  SELECT surface, weight,
         list_filter(string_split(lower(surface), ' '),
                     x -> x <> '' AND x NOT IN (""" + _STOPS + """)) AS toks
  FROM ent
)
SELECT surface, weight FROM an
WHERE len(list_filter(toks, x -> x LIKE 'key%')) > 0
ORDER BY weight DESC, surface ASC
LIMIT 5
""",
)
def infix_suggest(spark, sf_dir):
    """AnalyzingInfixSuggester: 'key' matches a token ANYWHERE in the
    suggestion (e.g. 'scan key'), not only at the start — the infix
    behavior the plain prefix suggester cannot express."""
    from lucenenet_spark.search.suggest import AnalyzingInfixSuggester

    _, _, docs = get_engine(spark, sf_dir)
    ent = (
        docs.select(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)).alias("surface")
        )
        .groupBy("surface")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    return AnalyzingInfixSuggester(ent).lookup("key", 5)


@gate(
    "fuzzy_suggest",
    SQL_PRELUDE + """
SELECT term AS surface, CAST(ttf AS BIGINT) AS weight
FROM ts
WHERE term LIKE 'v%'
  AND length(term) >= 5
  AND damerau_levenshtein(substr(term, 1, 6), 'vektor') <= 1
ORDER BY weight DESC, surface ASC
LIMIT 5
""",
)
def fuzzy_suggest(spark, sf_dir):
    """FuzzySuggester over the term dictionary (surface=term, weight=ttf):
    key 'vektor' reaches 'vector' within 1 OSA edit (non-fuzzy first
    char, min_fuzzy_length=3)."""
    from lucenenet_spark.search.suggest import FuzzySuggester

    idx, _, _ = get_engine(spark, sf_dir)
    ent = idx.term_stats.filter(F.col("field") == idx.default_field).select(
        F.col("term").alias("surface"), F.col("ttf").cast("long").alias("weight")
    )
    return FuzzySuggester(ent, max_edits=1, non_fuzzy_prefix=1).lookup("vektor", 5)


@gate(
    "free_text_suggest",
    SQL_PRELUDE + """,
seqs AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM tokf
),
big AS (
  SELECT a.term AS w1, b.term AS w2
  FROM seqs a JOIN seqs b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
),
uni AS (SELECT term AS w2, CAST(count(*) AS BIGINT) AS c1 FROM seqs GROUP BY term),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM seqs),
bc AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM big WHERE w1 = 'fast' GROUP BY w2),
cc AS (SELECT c1 AS ctx FROM uni WHERE w2 = 'fast')
SELECT u.w2 AS token,
       CAST(floor(
         (CASE WHEN bc.c2 IS NOT NULL
               THEN bc.c2 / CAST(cc.ctx AS DOUBLE)
               ELSE 0.4 * u.c1 / tot.t END) * 10000000 + 0.5) AS BIGINT) AS score_q
FROM uni u LEFT JOIN bc USING (w2), cc, tot
WHERE u.w2 LIKE 'me%'
ORDER BY score_q DESC, token ASC
LIMIT 5
""",
)
def free_text_suggest(spark, sf_dir):
    """FreeTextSuggester (bigram stupid-backoff LM, ALPHA=0.4): complete
    'me...' after context word 'fast' — bigram hit scores c(fast,w)/
    c(fast), unseen bigrams back off to 0.4 * c(w)/total."""
    from lucenenet_spark.search.suggest import FreeTextSuggester

    _, _, docs = get_engine(spark, sf_dir)
    return FreeTextSuggester(docs).lookup("fast", "me", 5)


# ==========================================================================
# Parser: grouped field syntax field:(a b) (classic grammar clause-list
# field binding, Classic/QueryParser.jj Clause production)
# ==========================================================================
@gate(
    "grouped_field_query",
    """
SELECT DISTINCT doc_id FROM documents WHERE source IN ('src1', 'src2')
""",
)
def grouped_field_query(spark, sf_dir):
    """Parse 'source:(src1 src2)' over the 2-field index: the group field
    binds both terms -> OR over the source field's postings."""
    from lucenenet_spark.plans.gate_fields import get_engine2
    from lucenenet_spark.queryparser.parser import QueryParser

    _, s2 = get_engine2(spark, sf_dir)
    q = QueryParser().parse("source:(src1 src2)")
    return s2.docset(q)
