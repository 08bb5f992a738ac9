"""Round-3b gates: MemoryIndex percolation, PostingsHighlighter,
ComplexPhrase + Surround parser dialects.  Full DuckDB oracles."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import (
    SQL_PRELUDE,
    _SQL_SCORED,
    _spark_score_q,
    _tsc,
    gate,
    get_engine,
)
from lucenenet_spark.search.queries import TermQuery


# ==========================================================================
# MemoryIndex percolation (Lucene.Net.Memory/MemoryIndex.cs): a registry of
# stored queries matched against each document, zero-shuffle mapInPandas.
# ==========================================================================
@gate(
    "percolate_matches",
    SQL_PRELUDE + """
SELECT doc_id, 'q_term' AS query_id FROM post WHERE term = 'vector'
UNION ALL
SELECT a.doc_id, 'q_and' FROM (SELECT doc_id FROM post WHERE term = 'merge') a
JOIN (SELECT doc_id FROM post WHERE term = 'key') b USING (doc_id)
UNION ALL
SELECT doc_id, 'q_not' FROM post WHERE term = 'table'
  AND doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
UNION ALL
SELECT DISTINCT a.doc_id, 'q_phrase' FROM tokf a
JOIN tokf b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'key' AND b.term = 'agg'
UNION ALL
SELECT DISTINCT doc_id, 'q_prefix' FROM post WHERE term LIKE 'du%'
UNION ALL
SELECT doc_id, 'q_msm' FROM post WHERE term IN ('scan', 'agg', 'hash')
GROUP BY doc_id HAVING count(DISTINCT term) >= 2
""",
)
def percolate_matches(spark, sf_dir):
    """Percolate the corpus against 6 registered queries covering every
    MemoryIndex.matches branch (term/AND/NOT/phrase/prefix/msm)."""
    from lucenenet_spark.search.memory import percolate
    from lucenenet_spark.search.queries import (
        BooleanQuery,
        Occur,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )

    _, _, docs = get_engine(spark, sf_dir)
    registry = {
        "q_term": TermQuery("vector"),
        "q_and": BooleanQuery.of(
            (TermQuery("merge"), Occur.MUST), (TermQuery("key"), Occur.MUST)
        ),
        "q_not": BooleanQuery.of(
            (TermQuery("table"), Occur.MUST), (TermQuery("dup"), Occur.MUST_NOT)
        ),
        "q_phrase": PhraseQuery(terms=("key", "agg")),
        "q_prefix": PrefixQuery(prefix="du"),
        "q_msm": BooleanQuery.of(
            (TermQuery("scan"), Occur.SHOULD),
            (TermQuery("agg"), Occur.SHOULD),
            (TermQuery("hash"), Occur.SHOULD),
            minimum_should_match=2,
        ),
    }
    return percolate(docs, registry)


# ==========================================================================
# PostingsHighlighter (Highlighter/PostingsHighlight/PostingsHighlighter.cs
# + PassageScorer.cs): best passage per matching doc, PassageScorer math,
# window breaks (documented BreakIterator substitute on this corpus).
# ==========================================================================
@gate(
    "postings_highlight",
    """
WITH tok AS (
  SELECT doc_id, length(text) AS clen,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
woff AS (
  SELECT *, sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS UNBOUNDED PRECEDING) - (length(tok) + 1) AS off
  FROM tok
),
w AS (SELECT *, CAST(floor(pos / 8.0) AS INT) AS win FROM woff),
wl AS (
  SELECT doc_id, win,
         CAST(min(off) AS BIGINT) AS pstart,
         sum(length(tok)) + count(*) - 1 AS plen,
         sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS f0,
         string_agg(CASE WHEN tok = 'vector' THEN '<b>' || tok || '</b>'
                         ELSE tok END, ' ' ORDER BY pos) AS snippet,
         any_value(clen) AS clen
  FROM w GROUP BY doc_id, win
),
dl AS (
  SELECT doc_id, sum(CASE WHEN tok = 'vector' THEN 1 ELSE 0 END) AS ttf
  FROM w GROUP BY doc_id HAVING ttf > 0
),
sc AS (
  SELECT wl.doc_id, wl.pstart, wl.snippet,
         (1.0 + 1.0 / ln(87.0 + wl.pstart)) *
         (2.2 * ln(1.0 + ((1.0 + wl.clen / 87.0) + 0.5) / (dl.ttf + 0.5))
          * (wl.f0 / (wl.f0 + 1.2 * (0.25 + 0.75 * wl.plen / 87.0)))) AS score
  FROM wl JOIN dl USING (doc_id)
  WHERE wl.f0 > 0
),
q AS (
  SELECT doc_id, pstart, snippet,
         CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC, pstart ASC) AS rn
  FROM sc
)
SELECT doc_id, pstart, score_q, snippet FROM q WHERE rn = 1
""",
)
def postings_highlight(spark, sf_dir):
    """Best passage for TermQuery('vector') over every matching doc."""
    from lucenenet_spark.search.postings_highlight import highlight_postings

    _, _, docs = get_engine(spark, sf_dir)
    out = highlight_postings(docs, ["vector"], window=8, max_passages=1)
    return out.select(
        "doc_id", F.col("pstart").cast("long").alias("pstart"), "score_q", "snippet"
    )


# ==========================================================================
# ComplexPhraseQueryParser (QueryParser/ComplexPhrase/): wildcards inside
# phrases -> span rewrite with pushed-down term-dictionary predicates.
# ==========================================================================
@gate(
    "complex_phrase_query",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id FROM tokf a
JOIN tokf b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term LIKE 'sc%' AND b.term LIKE 'ta%'
""",
)
def complex_phrase_query(spark, sf_dir):
    '''"sc* ta*": a term starting sc immediately followed by one starting ta.'''
    from lucenenet_spark.queryparser.complex_phrase import complex_phrase_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return complex_phrase_docs(idx, '"sc* ta*"')


@gate(
    "complex_phrase_sloppy",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id FROM tokf a
JOIN tokf b ON a.doc_id = b.doc_id
WHERE a.term IN ('merge', 'batch') AND b.term = 'key'
  AND a.pos <> b.pos AND abs(b.pos - a.pos) - 1 <= 2
""",
)
def complex_phrase_sloppy(spark, sf_dir):
    '''"(merge batch) key"~2 — alternatives group + slop>0 => UNORDERED
    span near (ComplexPhraseQuery.Rewrite: inOrder only when slop == 0).'''
    from lucenenet_spark.queryparser.complex_phrase import complex_phrase_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return complex_phrase_docs(idx, '"(merge batch) key"~2')


# ==========================================================================
# Surround query language (QueryParser/Surround/): prefix-notation
# W/N distance ops + boolean algebra.
# ==========================================================================
@gate(
    "surround_query",
    SQL_PRELUDE + """
SELECT DISTINCT a.doc_id FROM tokf a
JOIN tokf b ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos - a.pos <= 4
WHERE a.term = 'merge' AND b.term = 'key'
  AND a.doc_id NOT IN (SELECT doc_id FROM post WHERE term = 'dup')
""",
)
def surround_query(spark, sf_dir):
    """not(4w(merge, key), dup): ordered distance-4 span minus dup docs
    (DistanceQuery slop = opDistance - 1; NotQuery)."""
    from lucenenet_spark.queryparser.surround import surround_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return surround_docs(idx, "not(4w(merge, key), dup)")


@gate(
    "surround_or_n",
    SQL_PRELUDE + """
SELECT doc_id FROM (
  SELECT a.doc_id FROM (SELECT doc_id FROM post WHERE term = 'scan') a
  JOIN (SELECT doc_id FROM post WHERE term = 'agg') b USING (doc_id)
  UNION
  SELECT DISTINCT a.doc_id FROM tokf a
  JOIN tokf b ON a.doc_id = b.doc_id
  WHERE a.term = 'vector' AND b.term = 'merge'
    AND a.pos <> b.pos AND abs(b.pos - a.pos) - 1 <= 1
)
""",
)
def surround_or_n(spark, sf_dir):
    """or(and(scan, agg), 2n(vector, merge)): boolean algebra over an
    unordered distance op."""
    from lucenenet_spark.queryparser.surround import surround_docs

    idx, _, _ = get_engine(spark, sf_dir)
    return surround_docs(idx, "or(and(scan, agg), 2n(vector, merge))")


# ==========================================================================
# IVF ANN (beyond reference; the FAISS IVF-Flat shape as DataFrame ops):
# coarse-quantizer cells -> probe top-nprobe cells -> exact cosine.
# ==========================================================================
_IVF_N = 16
_IVF_PROBE = 2
_IVF_SEED = 7
_IVF_DIM = 64


def _ivf_sql() -> str:
    # TRAINED quantizer (r4): deterministic seeded spherical k-means on the
    # pinned reference sample; the trained centroid literals are embedded
    # below, so the oracle reproduces cell assignment + probe exactly.
    from lucenenet_spark.functions import similarity as fsim

    cents = fsim.trained_ivf_centroids(_IVF_N, _IVF_SEED)
    lits = [("[" + ", ".join(repr(x) for x in c) + "]") for c in cents]
    dots = ",\n         ".join(
        f"list_dot_product(CAST(embedding AS DOUBLE[]), {lits[c]}) AS d{c}"
        for c in range(_IVF_N)
    )
    g = "greatest(" + ", ".join(f"d{c}" for c in range(_IVF_N)) + ")"
    argmax = "CASE " + " ".join(
        f"WHEN d{c} = {g} THEN {c}" for c in range(_IVF_N)
    ) + " END"
    cent_values = ",\n    ".join(f"({c}, {lits[c]})" for c in range(_IVF_N))
    return f"""
WITH cent(cid, cv) AS (VALUES
    {cent_values}
),
dots AS (
  SELECT vec_id,
         {dots}
  FROM embeddings
),
assign AS (SELECT vec_id, {argmax} AS cid FROM dots),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cent, qv
  ORDER BY list_dot_product(cv, q) DESC, cid ASC LIMIT {_IVF_PROBE}
),
cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe)),
e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings JOIN cand USING (vec_id)
),
qe AS (
  SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id = 0
),
d AS (
  SELECT e.vec_id, sum(e.v * qe.v) AS dot, sum(e.v * e.v) AS n2
  FROM e JOIN qe USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sum(v * v) AS n2 FROM qe)
SELECT d.vec_id,
       CAST(floor(d.dot / sqrt(d.n2 * qn.n2) * 10000 + 0.5) AS BIGINT) AS cos_q
FROM d, qn
ORDER BY cos_q DESC, d.vec_id ASC LIMIT 10
"""


@gate("ann_ivf_topk", _ivf_sql())
def ann_ivf_topk(spark, sf_dir):
    """IVF-cell ANN with a TRAINED coarse quantizer (seeded spherical
    k-means on the pinned reference sample): nearest-centroid assignment
    (argmax dot, ties to smallest cid), probe 2 cells, exact quantized
    cosine within them."""
    from lucenenet_spark.functions import similarity as fsim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return fsim.ivf_topk(
        emb, query_vec_id=0, k=10, nprobe=_IVF_PROBE,
        seed=_IVF_SEED, dim=_IVF_DIM, quantized=True,
        centroids=fsim.trained_ivf_centroids(_IVF_N, _IVF_SEED),
    )


# ==========================================================================
# PatternReplaceCharFilter (Analysis/Pattern/PatternReplaceCharFilter.cs):
# regex normalization of the raw char stream before tokenization.
# ==========================================================================
@gate(
    "pattern_replace_term",
    SQL_PRELUDE + "," + _SQL_SCORED + """
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM (""" + _tsc("vector") + """)
""",
)
def pattern_replace_term(spark, sf_dir):
    """PatternReplaceCharFilter round-trip: leet-corrupt every 'vector' in
    the raw text (v3ct0r), then index through
    PatternReplaceAnalyzer(r'v[0-9]ct[0-9]r' -> 'vector') — the char
    filter must restore the original token stream, so BM25 for 'vector'
    matches the UNMODIFIED corpus oracle exactly (scores, dl, positions)."""
    from lucenenet_spark.analysis.analyzers import PatternReplaceAnalyzer
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    _, _, docs = get_engine(spark, sf_dir)
    docs2 = docs.select(
        "doc_id", F.regexp_replace("text", "vector", "v3ct0r").alias("text")
    )
    idx = build_index(docs2, analyzer=PatternReplaceAnalyzer(r"v[0-9]ct[0-9]r", "vector"))
    s = IndexSearcher(idx, mode="double")
    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# SweetSpotSimilarity (Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs):
# plateau lengthNorm + baselineTf behind the Classic weight lifecycle.
# ==========================================================================
@gate(
    "sweetspot_term",
    SQL_PRELUDE + """,
w AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = 'vector'
),
vals AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM w
)
SELECT p.doc_id,
       CAST(floor((
         (CASE WHEN p.tf <= 1.0 THEN 1.0 ELSE sqrt(p.tf + 1.0*1.0 - 1.0) END)
         * vals.value
         * (1 / sqrt(0.5 * (abs(dl.dl - 20) + abs(dl.dl - 40) - 20) + 1.0))
       ) * 10000 + 0.5) AS BIGINT) AS score_q
FROM post p JOIN dl USING (doc_id), vals
WHERE p.term = 'vector'
""",
)
def sweetspot_term(spark, sf_dir):
    """TermQuery under SweetSpotSimilarity(ln 20..40 plateau, steepness
    0.5; baselineTf base=1 min=1): docs inside the length sweet spot get
    the full norm 1.0, tf saturates to base below min."""
    from lucenenet_spark.search.sweetspot import SweetSpotSearcher

    idx, _, _ = get_engine(spark, sf_dir)
    s = SweetSpotSearcher(idx, ln_min=20, ln_max=40, steepness=0.5,
                          tf_base=1.0, tf_min=1.0)
    return _spark_score_q(s.scored(TermQuery("vector")))


# ==========================================================================
# Streaming exact dedup (training-pipeline op; batch twin gate — the
# stream-vs-batch pytest carries the streaming semantics)
# ==========================================================================
@gate(
    "dedup_stream_survivors",
    """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS text_hash
FROM documents GROUP BY md5(text)
""",
)
def dedup_stream_survivors(spark, sf_dir):
    """Surviving (doc_id, text_hash) after exact dedup — the batch twin
    of the streaming dropDuplicates plan (first-by-id representative)."""
    from lucenenet_spark.streaming.windows import dedup_exact_stream

    _, _, docs = get_engine(spark, sf_dir)
    return dedup_exact_stream(docs).select(
        F.col("doc_id").cast("long"), "text_hash"
    )


# ==========================================================================
# FastVectorHighlighter analogue (Highlighter/VectorHighlight/):
# phrase-aware highlighting from stored positions.
# ==========================================================================
@gate(
    "fvh_phrase_fragment",
    SQL_PRELUDE + """,
st AS (
  SELECT a.doc_id, a.pos AS p0 FROM tokf a
  JOIN tokf b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'key' AND b.term = 'agg'
),
mm AS (
  SELECT doc_id, min(p0) AS m0,
         list_distinct(flatten(list([p0, p0 + 1]))) AS mset
  FROM st GROUP BY doc_id
),
fr AS (
  SELECT mm.doc_id, mm.m0, mm.mset,
         string_split(d.text, ' ') AS toks
  FROM mm JOIN documents d USING (doc_id)
)
SELECT doc_id,
       array_to_string(
         list_transform(
           range(CAST(greatest(0, m0 - 3) AS BIGINT),
                 CAST(least(len(toks) - 1, m0 + 1 + 3) AS BIGINT) + 1),
           i -> CASE WHEN list_contains(mset, i)
                     THEN '<b>' || toks[i + 1] || '</b>'
                     ELSE toks[i + 1] END),
         ' ') AS frag
FROM fr
""",
)
def fvh_phrase_fragment(spark, sf_dir):
    """Phrase "key agg": fragment around the first match, only
    phrase-participating occurrences bolded (FieldPhraseList semantics)."""
    from lucenenet_spark.search.fvh import fvh_phrase_fragments

    idx, _, docs = get_engine(spark, sf_dir)
    return fvh_phrase_fragments(idx, docs, ["key", "agg"])
