"""Gate registry round-5 part u: anchor-text aggregation over the
deterministic link graph (Brin & Page 1998 §2.2), the set-based
MoreLikeThis.RetrieveInterestingTerms surface (MoreLikeThis.cs:674),
and Zipf rank–frequency vocabulary statistics (corpus-health signal).
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate

# ----------------------------------------------------------------------
# anchor_text_agg — regenerate the Knuth-hash link graph WITH per-edge
# anchors (3-token window of the source text at offset j) and aggregate
# per target. Mirrors functions/anchors.py bit-for-bit: DuckDB list
# indexing t[j+1] == Spark F.get(toks, j) (0-indexed), concat_ws skips
# NULL slots in both engines, list_sort/array_sort agree on ASCII.
# ----------------------------------------------------------------------
_ANCHOR_K = 20
_ANCHOR_CAP = 64

_ANCHOR_SQL = f"""
WITH nodes AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
e AS (
  SELECT src,
         CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst,
         concat_ws(' ', toks[j + 1], toks[j + 2], toks[j + 3]) AS anchor
  FROM (
    SELECT nd.doc_id AS src, nd.toks,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           u.j AS j, nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
)
SELECT dst,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(count(DISTINCT src) AS BIGINT) AS n_src,
       array_to_string(
         (list_sort(list_distinct(list(anchor))))[1:{_ANCHOR_CAP}], '|'
       ) AS anchors_cat
FROM e GROUP BY dst
ORDER BY n_anchors DESC, dst ASC LIMIT {_ANCHOR_K}
"""


@gate("anchor_text_agg", _ANCHOR_SQL)
def anchor_text_agg(spark, sf_dir):
    """Per-target anchor-text aggregation (Brin & Page 1998 §2.2): one
    bounded groupBy(dst) over the deterministic synthetic link graph,
    each edge carrying a 3-token source-text window as its anchor."""
    from lucenenet_spark.functions.anchors import anchor_text_agg as _agg
    from lucenenet_spark.functions.anchors import build_anchor_edges
    from lucenenet_spark.plans.gate import _docs_table

    edges = build_anchor_edges(_docs_table(spark, sf_dir))
    return _agg(edges, k=_ANCHOR_K, max_anchors=_ANCHOR_CAP)


# ----------------------------------------------------------------------
# mlt_interesting_terms — MoreLikeThis.RetrieveInterestingTerms for a
# seed SET of docs in one plan. Oracle reuses the shared analyzer
# prelude (post/ts/cs) and the exact tf*(ln(n/(df+1))+1) formula.
# ----------------------------------------------------------------------
_MLT_MAXDOC = 8
_MLT_PERDOC = 5
_MLT_MINTF = 2
_MLT_MINDF = 2

_MLT_SQL = SQL_PRELUDE + f""",
cand AS (
  SELECT p.doc_id, p.term,
         CAST(floor(p.tf * (ln(cs.n / (ts.df + 1)) + 1) * 1000000 + 0.5)
              AS BIGINT) AS score_q
  FROM post p JOIN ts USING (term), cs
  WHERE p.doc_id < {_MLT_MAXDOC} AND p.tf >= {_MLT_MINTF} AND ts.df >= {_MLT_MINDF}
),
rk AS (
  SELECT doc_id, term, score_q,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score_q DESC, term ASC) AS BIGINT) AS rnk
  FROM cand
)
SELECT doc_id, rnk, term, score_q FROM rk WHERE rnk <= {_MLT_PERDOC}
"""


@gate("mlt_interesting_terms", _MLT_SQL)
def mlt_interesting_terms(spark, sf_dir):
    """Set-based RetrieveInterestingTerms (MoreLikeThis.cs:674): top-5
    tf*idf terms per seed doc, quantized scores, term tie-break."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.mlt import interesting_terms

    idx, _, _ = get_engine(spark, sf_dir)
    return interesting_terms(
        idx,
        max_doc_id=_MLT_MAXDOC,
        per_doc=_MLT_PERDOC,
        min_term_freq=_MLT_MINTF,
        min_doc_freq=_MLT_MINDF,
    )


# ----------------------------------------------------------------------
# zipf_vocab_stats — quantize-then-integer-sum regression so both
# engines do identical IEEE ops: xq/yq bigints, exact integer sums,
# final slope/intercept formula in double, quantized out.
# ----------------------------------------------------------------------
_ZIPF_SQL = SQL_PRELUDE + """,
rk AS (
  SELECT term, ttf,
         CAST(row_number() OVER (ORDER BY ttf DESC, term ASC) AS BIGINT) AS rank
  FROM ts
),
qv AS (
  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS xq,
         CAST(floor(ln(CAST(ttf AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS yq,
         ttf
  FROM rk
),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xq) AS BIGINT) AS sx,
         CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * yq) AS BIGINT) AS sxy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx,
         CAST(sum(ttf) AS BIGINT) AS total_tokens
  FROM qv
)
SELECT n AS n_terms, total_tokens,
       CAST(floor(
         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000.0 + 0.5
       ) AS BIGINT) AS slope_q,
       CAST(floor(
         (CAST(sy AS DOUBLE)
          - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) + 0.5
       ) AS BIGINT) AS intercept_q
FROM ag
"""


@gate("zipf_vocab_stats", _ZIPF_SQL)
def zipf_vocab_stats(spark, sf_dir):
    """Zipf rank–frequency least-squares fit over the term dictionary
    (slope ≈ -1 for natural text): quantized-input integer-sum
    regression, bit-stable across engines."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.functions.textstats import zipf_vocab_stats as _zipf
    from pyspark.sql import functions as F

    idx, _, _ = get_engine(spark, sf_dir)
    ts = idx.term_stats.filter(F.col("field") == idx.default_field).select("term", "ttf")
    return _zipf(ts)


# ----------------------------------------------------------------------
# anchor_field_search — BM25 retrieval over the AGGREGATED ANCHOR FIELD:
# each page's pseudo-document is the multiset of incoming anchor strings
# (sorted for determinism, multiplicity kept so repeated anchors raise
# tf), indexed with the standard analyzer and searched like any field.
# This is the classic web-search composition (Brin & Page 1998 §2.2 —
# anchor words are indexed AS the target's content; same shape as the
# MS MARCO anchor corpus). The oracle regenerates graph + anchors +
# pseudo-docs in SQL and scores the identical double BM25.
# ----------------------------------------------------------------------
_AFS_TERM = "filter"
_AFS_K = 10


def _anchor_field_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return f"""
WITH nodes AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
e AS (
  SELECT src,
         CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst,
         concat_ws(' ', toks[j + 1], toks[j + 2], toks[j + 3]) AS anchor
  FROM (
    SELECT nd.doc_id AS src, nd.toks,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           u.j AS j, nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
),
ad AS (
  SELECT dst AS doc_id,
         array_to_string(list_sort(list(anchor)), ' ') AS text
  FROM e GROUP BY dst
),
docs2 AS (
  SELECT d.doc_id, coalesce(ad.text, '') AS text
  FROM documents d LEFT JOIN ad USING (doc_id)
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs2
),
tokf AS (
  SELECT doc_id, term FROM tok WHERE term <> '' AND term NOT IN ({stops})
),
post AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tokf GROUP BY doc_id, term
),
dl AS (
  SELECT d.doc_id, CAST(coalesce(x.dl, 0) AS BIGINT) AS dl
  FROM docs2 d
  LEFT JOIN (SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id) x USING (doc_id)
),
ts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
),
cs AS (
  SELECT CAST((SELECT count(*) FROM docs2) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM tokf) AS DOUBLE) AS sttf
),
sc AS (
  SELECT p.doc_id,
         ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5))
           * 2.2 * p.tf
           / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / (cs.sttf / cs.n))) AS score
  FROM post p JOIN dl USING (doc_id) JOIN ts USING (term), cs
  WHERE p.term = '{_AFS_TERM}'
)
SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
FROM sc ORDER BY score_q DESC, doc_id ASC LIMIT {_AFS_K}
"""


@gate("anchor_field_search", _anchor_field_sql())
def anchor_field_search(spark, sf_dir):
    """BM25 top-k over the aggregated incoming-anchor field: link graph
    -> per-target anchor pseudo-doc -> build_index -> TermQuery. One
    groupBy builds the field; the search is the standard engine path."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.anchors import build_anchor_edges
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _docs_table, _spark_score_q
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = _docs_table(spark, sf_dir)
    edges = build_anchor_edges(docs)
    adoc = edges.groupBy("dst").agg(
        F.array_join(F.array_sort(F.collect_list("anchor")), " ").alias("atext")
    )
    docs2 = (
        docs.select("doc_id")
        .join(adoc, docs["doc_id"] == adoc["dst"], "left")
        .select("doc_id", F.coalesce(F.col("atext"), F.lit("")).alias("text"))
    )
    idx = build_index(docs2, text_col="text", id_col="doc_id")
    searcher = IndexSearcher(idx, mode="double")
    scored = _spark_score_q(searcher.scored(TermQuery(_AFS_TERM)))
    return scored.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(_AFS_K)


# ----------------------------------------------------------------------
# static_rank_blend — the web-search ranking composition: BM25 text
# relevance blended with a query-INDEPENDENT static document prior
# (PageRank over the link graph). Every production web engine ranks
# this way (Brin & Page 1998 §4.5 combine link rank with IR score;
# Lucene's analogue is CustomScoreQuery / FunctionQuery wrapping a
# stored rank field, Queries/CustomScore/CustomScoreQuery.cs).
#
# Determinism: the prior is the 1e-7-QUANTIZED pagerank (the exact
# bigint the pagerank_topk gate proved engine-identical), so the blend
# ln(1 + pr_q) runs on identical integers; BM25 uses the shared double
# path. blended = bm25 + 0.3 * ln(1 + pr_q), quantized 1e4.
#
# Scale note: at index time the prior would be materialized as a
# DocValues column (one broadcast-joinable table keyed by doc_id), so
# serving pays ZERO extra shuffle; here the join is explicit because
# the gate builds both sides on the fly.
# ----------------------------------------------------------------------
_SRB_TERM = "vector"
_SRB_K = 10
_SRB_W = 0.3


def _static_rank_blend_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED
    from lucenenet_spark.plans.gate_round5t import _GRAPH_CTES, _PR_D, _PR_ITERS

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
    return (
        _PRE
        + ","
        + _SCORED
        + f""",
{_GRAPH_CTES},
r0 AS (SELECT nd.doc_id, 1.0 / nn.n AS pr FROM nodes nd CROSS JOIN nn),{",".join(iters)},
prq AS (
  SELECT doc_id, CAST(floor(pr * 10000000.0 + 0.5) AS BIGINT) AS pr_q
  FROM r{_PR_ITERS}
),
txt AS (
  SELECT doc_id, idf * 2.2 * tf / (tf + nrm) AS score
  FROM sc WHERE term = '{_SRB_TERM}'
)
SELECT t.doc_id,
       CAST(floor((t.score + {_SRB_W!r} * ln(1 + p.pr_q)) * 10000 + 0.5)
            AS BIGINT) AS score_q
FROM txt t JOIN prq p USING (doc_id)
ORDER BY score_q DESC, doc_id ASC LIMIT {_SRB_K}
"""
    )


@gate("static_rank_blend", _static_rank_blend_sql())
def static_rank_blend(spark, sf_dir):
    """BM25 + static-prior blending: text score for one term plus
    0.3 * ln(1 + quantized PageRank), the query-independent rank
    signal joined per doc (DocValues-column shape at index time)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.pagerank import build_link_graph, pagerank
    from lucenenet_spark.plans.gate import _docs_table, get_engine
    from lucenenet_spark.plans.gate_round5t import _PR_D, _PR_ITERS
    from lucenenet_spark.search.queries import TermQuery

    _, searcher, docs = get_engine(spark, sf_dir)
    nodes = docs.select("doc_id")
    pr = pagerank(
        nodes, build_link_graph(nodes), damping=_PR_D, iterations=_PR_ITERS
    ).select(
        "doc_id",
        F.floor(F.col("pr") * F.lit(1e7) + F.lit(0.5)).cast("long").alias("pr_q"),
    )
    scored = searcher.scored(TermQuery(_SRB_TERM)).select("doc_id", "score")
    blended = scored.join(pr, "doc_id").select(
        "doc_id",
        F.floor(
            (F.col("score") + F.lit(_SRB_W) * F.log(F.lit(1) + F.col("pr_q")))
            * F.lit(10000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("score_q"),
    )
    return blended.orderBy(F.desc("score_q"), F.asc("doc_id")).limit(_SRB_K)


# ----------------------------------------------------------------------
# link_graph_stats — crawl-graph diagnostics panel (Broder et al.
# WWW'00): edge/node counts, degree extremes, self-loops, reciprocity
# over the deterministic link graph. Oracle regenerates the graph and
# computes the identical aggregates; reciprocity is the same
# dedup -> reversed-key self-join -> a<b count.
# ----------------------------------------------------------------------
_LGS_SQL = """
WITH nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
e AS (
  SELECT src, CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst
  FROM (
    SELECT nd.doc_id AS src,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
),
d AS (SELECT DISTINCT src, dst FROM e),
rec AS (
  SELECT CAST(count(*) AS BIGINT) AS reciprocal_pairs
  FROM d a JOIN d b ON a.src = b.dst AND a.dst = b.src
  WHERE a.src < a.dst
),
outd AS (
  SELECT CAST(max(od) AS BIGINT) AS max_out_degree
  FROM (SELECT src, count(*) AS od FROM d GROUP BY src)
),
ind AS (
  SELECT CAST(max(idg) AS BIGINT) AS max_in_degree
  FROM (SELECT dst, count(*) AS idg FROM d GROUP BY dst)
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(count(DISTINCT src) AS BIGINT) AS n_src_nodes,
         CAST(count(DISTINCT dst) AS BIGINT) AS n_dst_nodes,
         CAST(sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS self_loops
  FROM e
),
dd AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct_edges FROM d)
SELECT n_edges, n_src_nodes, n_dst_nodes, self_loops, n_distinct_edges,
       max_out_degree, max_in_degree, reciprocal_pairs
FROM base, dd, outd, ind, rec
"""


@gate("link_graph_stats", _LGS_SQL)
def link_graph_stats(spark, sf_dir):
    """Link-graph diagnostics (Broder et al. WWW'00 web-structure
    measures) over the deterministic synthetic graph: one row of
    degree/reciprocity/self-loop aggregates."""
    from lucenenet_spark.functions.pagerank import build_link_graph, graph_stats
    from lucenenet_spark.plans.gate import _docs_table

    nodes = _docs_table(spark, sf_dir).select("doc_id")
    return graph_stats(build_link_graph(nodes))


# ----------------------------------------------------------------------
# host_collapse_topk — SERP site collapsing: at most H results per host
# in the final top-k (every production web engine diversifies results
# this way; in Lucene terms it is grouping.GroupDocs with per-group
# doc limit — Grouping/TopGroups.cs — applied to the BM25 ranking).
# One window per host over the scored rows, then the global top-k:
# rank within host by (score DESC, doc_id ASC), keep rank <= H,
# re-sort globally. The window partitions by host, so skew = hottest
# host's matching docs, bounded by the match set, not the corpus.
# ----------------------------------------------------------------------
_HC_TERM = "vector"
_HC_K = 10
_HC_PER_HOST = 2


def _host_collapse_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED

    return (
        _PRE
        + ","
        + _SCORED
        + f""",
txt AS (
  SELECT sc.doc_id,
         CAST(floor(idf * 2.2 * tf / (tf + nrm) * 10000 + 0.5) AS BIGINT)
           AS score_q
  FROM sc WHERE term = '{_HC_TERM}'
),
hosted AS (
  SELECT t.doc_id, t.score_q, d.source,
         row_number() OVER (
           PARTITION BY d.source ORDER BY t.score_q DESC, t.doc_id ASC
         ) AS host_rank
  FROM txt t JOIN documents d USING (doc_id)
)
SELECT doc_id, score_q, source,
       CAST(host_rank AS BIGINT) AS host_rank
FROM hosted WHERE host_rank <= {_HC_PER_HOST}
ORDER BY score_q DESC, doc_id ASC LIMIT {_HC_K}
"""
    )


@gate("host_collapse_topk", _host_collapse_sql())
def host_collapse_topk(spark, sf_dir):
    """Site-collapsed BM25 top-k: per-host window keeps the best
    _HC_PER_HOST docs per source, then the global top-k re-sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import _spark_score_q, get_engine
    from lucenenet_spark.search.queries import TermQuery

    _, searcher, docs = get_engine(spark, sf_dir)
    scored = _spark_score_q(searcher.scored(TermQuery(_HC_TERM)))
    hosted = scored.join(docs.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("score_q"), F.asc("doc_id"))
    return (
        hosted.withColumn("host_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("host_rank") <= _HC_PER_HOST)
        .select("doc_id", "score_q", "source", "host_rank")
        .orderBy(F.desc("score_q"), F.asc("doc_id"))
        .limit(_HC_K)
    )


# ----------------------------------------------------------------------
# sparse_cosine_pairs — Bayardo/Ma/Srikant WWW'07 all-pairs similarity
# over the inverted index: per-term self-join (df-capped), integer-
# exact dot products and norms, final cosine in double. Oracle builds
# the identical quantized weights from the shared analyzer prelude.
# ----------------------------------------------------------------------
_SCP_DFCAP = 450
_SCP_K = 50


def _sparse_cosine_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE

    return (
        _PRE
        + f""",
w AS (
  SELECT p.doc_id, p.term,
         CAST(floor(p.tf * (ln(cs.n / (ts.df + 1)) + 1) * 1000 + 0.5)
              AS BIGINT) AS wq
  FROM post p JOIN ts USING (term), cs
  WHERE ts.df <= {_SCP_DFCAP}
),
norms AS (
  SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2 FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.wq * b.wq) AS BIGINT) AS dot
  FROM w a JOIN w b USING (term)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.doc_a, d.doc_b,
       CAST(floor(CAST(d.dot AS DOUBLE)
                  / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS cos_q
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
ORDER BY cos_q DESC, doc_a ASC, doc_b ASC LIMIT {_SCP_K}
"""
    )


@gate("sparse_cosine_pairs", _sparse_cosine_sql())
def sparse_cosine_pairs(spark, sf_dir):
    """All-pairs sparse TF-IDF cosine (Bayardo et al. WWW'07): df-capped
    per-term self-join, integer-exact dots/norms, top-k pairs."""
    from lucenenet_spark.functions.similarity import sparse_cosine_pairs as _scp
    from lucenenet_spark.plans.gate import get_engine

    idx, _, _ = get_engine(spark, sf_dir)
    fld = idx.default_field
    return _scp(
        idx.postings, idx.term_stats, idx.max_doc,
        df_cap=_SCP_DFCAP, k=_SCP_K, field=fld,
    )


# ----------------------------------------------------------------------
# proximity_boost_topk — BM25 + min-pair-distance bonus (Büttcher et
# al. SIGIR'06; Lucene's SpanNear/sloppy-phrase slop weighting intent,
# PhraseQuery.cs). The distance is integer-exact from the positional
# postings; the oracle recomputes it from the prelude's tokf positions.
# ----------------------------------------------------------------------
_PBX_A = "vector"
_PBX_B = "merge"
_PBX_K = 10


def _proximity_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED
    from lucenenet_spark.plans.gate import _tsc

    return (
        _PRE
        + ","
        + _SCORED
        + f""",
sa AS ({_tsc(_PBX_A)}),
sb AS ({_tsc(_PBX_B)}),
md AS (
  SELECT t1.doc_id, CAST(min(abs(t1.pos - t2.pos)) AS BIGINT) AS mindist
  FROM tokf t1 JOIN tokf t2 USING (doc_id)
  WHERE t1.term = '{_PBX_A}' AND t2.term = '{_PBX_B}'
  GROUP BY t1.doc_id
)
SELECT sa.doc_id,
       CAST(floor((sa.score + sb.score + 1.0 / (1 + md.mindist)) * 10000 + 0.5)
            AS BIGINT) AS score_q
FROM sa JOIN sb USING (doc_id) JOIN md USING (doc_id)
ORDER BY score_q DESC, doc_id ASC LIMIT {_PBX_K}
"""
    )


@gate("proximity_boost_topk", _proximity_sql())
def proximity_boost_topk(spark, sf_dir):
    """Conjunctive BM25 with additive 1/(1+mindist) proximity bonus."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.proximity import proximity_boost_topk as _pbx

    _, searcher, _ = get_engine(spark, sf_dir)
    return _pbx(searcher, _PBX_A, _PBX_B, k=_PBX_K)


# ----------------------------------------------------------------------
# pmi_collocations — Church & Hanks 1990 PMI over adjacent raw-token
# pairs, min-count gated, exact-integer counts, single quantized ln.
# ----------------------------------------------------------------------
_PMI_MIN = 5
_PMI_K = 20

_PMI_SQL = f"""
WITH tt AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS w FROM tt) GROUP BY w
),
tp AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT t FROM tt WHERE len(t) >= 2),
       unnest(generate_series(1, len(t) - 1)) AS u(i)
),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM tp GROUP BY w1, w2
),
tot AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS T,
         (SELECT CAST(sum(cb) AS BIGINT) FROM big) AS B
)
SELECT b.w1, b.w2, b.cb,
       CAST(floor(
         ln((CAST(b.cb AS DOUBLE) / tot.B)
            / ((CAST(u1.c AS DOUBLE) / tot.T) * (CAST(u2.c AS DOUBLE) / tot.T)))
         * 1000000.0 + 0.5) AS BIGINT) AS pmi_q
FROM big b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN tot
WHERE b.cb >= {_PMI_MIN}
ORDER BY pmi_q DESC, w1 ASC, w2 ASC LIMIT {_PMI_K}
"""


@gate("pmi_collocations", _PMI_SQL)
def pmi_collocations(spark, sf_dir):
    """Top-k PMI collocations over adjacent raw-token pairs."""
    from lucenenet_spark.functions.textstats import pmi_collocations as _pmi
    from lucenenet_spark.plans.gate import _docs_table

    return _pmi(_docs_table(spark, sf_dir), min_count=_PMI_MIN, k=_PMI_K)


# ----------------------------------------------------------------------
# bm25f_topk — true BM25F (Robertson/Zaragoza/Taylor CIKM'04) over
# body + anchor fields: per-field weighted length-normalized tf
# combined BEFORE one saturation, document-level idf. Two fields =>
# the per-doc tfn sum has at most 2 addends (commutative, engine-order
# independent). Oracle rebuilds both fields' postings in SQL.
# ----------------------------------------------------------------------
_B25F_TERM = "vector"
_B25F_K = 10
_B25F_WB = 1.0   # body weight
_B25F_WA = 2.0   # anchor weight


def _bm25f_sql() -> str:
    from lucenenet_spark.analysis.analyzers import ENGLISH_STOP_WORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return f"""
WITH nodes AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
e AS (
  SELECT src,
         CASE WHEN t = src THEN (t + 1) % n ELSE t END AS dst,
         concat_ws(' ', toks[j + 1], toks[j + 2], toks[j + 3]) AS anchor
  FROM (
    SELECT nd.doc_id AS src, nd.toks,
           ((nd.doc_id % nn.n) * 2654435761 + 40503 * (u.j + 1)) % nn.n AS t,
           u.j AS j, nn.n AS n
    FROM nodes nd
    CROSS JOIN nn
    CROSS JOIN unnest(generate_series(0, nd.doc_id % 3)) AS u(j)
  )
),
ad AS (
  SELECT dst AS doc_id, array_to_string(list_sort(list(anchor)), ' ') AS text
  FROM e GROUP BY dst
),
docs2 AS (
  SELECT d.doc_id, coalesce(ad.text, '') AS text
  FROM documents d LEFT JOIN ad USING (doc_id)
),
bt AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
  ) WHERE term <> '' AND term NOT IN ({stops})
),
at AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs2
  ) WHERE term <> '' AND term NOT IN ({stops})
),
bp AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM bt GROUP BY doc_id, term),
ap AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM at GROUP BY doc_id, term),
bdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM bt GROUP BY doc_id),
adl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM at GROUP BY doc_id),
ns AS (
  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
         CAST((SELECT count(*) FROM bt) AS DOUBLE) AS sttf_b,
         CAST((SELECT count(*) FROM at) AS DOUBLE) AS sttf_a
),
tr AS (
  SELECT bp.doc_id,
         {_B25F_WB!r} * bp.tf / (0.25 + 0.75 * bdl.dl / (ns.sttf_b / ns.n)) AS tfn_part
  FROM bp JOIN bdl USING (doc_id), ns WHERE bp.term = '{_B25F_TERM}'
  UNION ALL
  SELECT ap.doc_id,
         {_B25F_WA!r} * ap.tf / (0.25 + 0.75 * adl.dl / (ns.sttf_a / ns.n)) AS tfn_part
  FROM ap JOIN adl USING (doc_id), ns WHERE ap.term = '{_B25F_TERM}'
),
tfn AS (SELECT doc_id, sum(tfn_part) AS tfn FROM tr GROUP BY doc_id),
dfq AS (
  SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM (
    SELECT doc_id FROM bp WHERE term = '{_B25F_TERM}'
    UNION ALL
    SELECT doc_id FROM ap WHERE term = '{_B25F_TERM}'
  )
)
SELECT t.doc_id,
       CAST(floor(
         ln(1.0 + (ns.n - dfq.df + 0.5) / (dfq.df + 0.5))
         * t.tfn / (1.2 + t.tfn) * 10000 + 0.5) AS BIGINT) AS score_q
FROM tfn t, dfq, ns
ORDER BY score_q DESC, doc_id ASC LIMIT {_B25F_K}
"""


@gate("bm25f_topk", _bm25f_sql())
def bm25f_topk(spark, sf_dir):
    """True BM25F over body + incoming-anchor fields (weights 1.0/2.0):
    one multi-field index build, combined-tf saturation, document idf."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.anchors import build_anchor_edges
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.bm25f import bm25f_topk as _bm25f

    docs = _docs_table(spark, sf_dir)
    edges = build_anchor_edges(docs)
    adoc = edges.groupBy("dst").agg(
        F.array_join(F.array_sort(F.collect_list("anchor")), " ").alias("anchor")
    )
    docs3 = (
        docs.select("doc_id", "text")
        .join(adoc, docs["doc_id"] == adoc["dst"], "left")
        .select("doc_id", "text", F.coalesce(F.col("anchor"), F.lit("")).alias("anchor"))
    )
    idx = build_index(docs3, text_col="text", id_col="doc_id", fields=["text", "anchor"])
    return _bm25f(
        idx, _B25F_TERM, weights={"text": _B25F_WB, "anchor": _B25F_WA}, k=_B25F_K
    )


# ----------------------------------------------------------------------
# ndcg_topk — nDCG@10 (Järvelin & Kekäläinen TOIS'02) of the BM25
# ranking against corpus-derived graded qrels (grade = min(tf, 4)).
# Contributions quantized 1e9 -> exact integer DCG/IDCG sums.
# ----------------------------------------------------------------------
_NDCG_TERM = "vector"
_NDCG_K = 10
_NDCG_G = 4


def _ndcg_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED
    from lucenenet_spark.plans.gate import _tsc

    contrib = (
        "CAST(floor((pow(2.0, grade) - 1.0)"
        " / (ln(CAST(rank AS DOUBLE) + 1.0) / ln(2.0)) * 1000000000.0 + 0.5)"
        " AS BIGINT)"
    )
    return (
        _PRE
        + ","
        + _SCORED
        + f""",
g AS (
  SELECT doc_id, CAST(least(tf, {_NDCG_G}) AS BIGINT) AS grade
  FROM post WHERE term = '{_NDCG_TERM}'
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_NDCG_TERM)})
  )
),
run AS (
  SELECT {contrib} AS cq
  FROM ranked JOIN g USING (doc_id) WHERE rank <= {_NDCG_K}
),
ideal AS (
  SELECT {contrib} AS cq
  FROM (
    SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id ASC) AS rank
    FROM g
  ) WHERE rank <= {_NDCG_K}
),
dcg AS (SELECT CAST(sum(cq) AS BIGINT) AS dcg_q9 FROM run),
idcg AS (SELECT CAST(sum(cq) AS BIGINT) AS idcg_q9 FROM ideal)
SELECT dcg_q9, idcg_q9,
       CAST(floor(CAST(dcg_q9 AS DOUBLE) / CAST(idcg_q9 AS DOUBLE) * 1000000.0
                  + 0.5) AS BIGINT) AS ndcg_q
FROM dcg, idcg
"""
    )


@gate("ndcg_topk", _ndcg_sql())
def ndcg_topk(spark, sf_dir):
    """nDCG@10 of the BM25 ranking vs graded tf-derived qrels."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.quality import ndcg_at_k

    _, searcher, _ = get_engine(spark, sf_dir)
    return ndcg_at_k(searcher, _NDCG_TERM, k=_NDCG_K, max_grade=_NDCG_G)


# ----------------------------------------------------------------------
# query_clarity — Cronen-Townsend/Zhou/Croft SIGIR'02 clarity score:
# KL(result LM || collection LM) over the top-10 result set, per-word
# contributions quantized 1e9 then exactly summed.
# ----------------------------------------------------------------------
_QC_TERM = "vector"
_QC_K = 10


def _clarity_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED
    from lucenenet_spark.plans.gate import _tsc

    return (
        _PRE
        + ","
        + _SCORED
        + f""",
topd AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rank
    FROM (
      SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
      FROM ({_tsc(_QC_TERM)})
    )
  ) WHERE rank <= {_QC_K}
),
rtf AS (
  SELECT p.term, CAST(sum(p.tf) AS BIGINT) AS rtf
  FROM post p JOIN topd USING (doc_id) GROUP BY p.term
),
rlen AS (SELECT CAST(sum(rtf) AS BIGINT) AS rlen FROM rtf),
contrib AS (
  SELECT CAST(floor(
           (CAST(r.rtf AS DOUBLE) / rlen.rlen)
           * ln((CAST(r.rtf AS DOUBLE) / rlen.rlen)
                / (CAST(ts.ttf AS DOUBLE) / cs.sttf))
           * 1000000000.0 + 0.5) AS BIGINT) AS cq
  FROM rtf r JOIN ts USING (term), rlen, cs
)
SELECT CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(cq) AS BIGINT) AS clarity_q9
FROM contrib
"""
    )


@gate("query_clarity", _clarity_sql())
def query_clarity(spark, sf_dir):
    """Clarity score of the top-10 result set for one term query."""
    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.quality import query_clarity as _qc

    _, searcher, _ = get_engine(spark, sf_dir)
    return _qc(searcher, _QC_TERM, k=_QC_K)


# ----------------------------------------------------------------------
# rbo_rank_overlap — rank-biased overlap (Webber/Moffat/Zobel TOIS'10,
# p=0.9, depth 10) between the BM25 and ClassicSimilarity rankings of
# the same query: the standard ranker-similarity diagnostic. Overlaps
# are exact integers; per-depth contributions quantized 1e9 then
# exactly summed.
# ----------------------------------------------------------------------
_RBO_TERM = "vector"
_RBO_K = 10
_RBO_P = 0.9


def _rbo_sql() -> str:
    from lucenenet_spark.plans.gate import SQL_PRELUDE as _PRE
    from lucenenet_spark.plans.gate import _SQL_SCORED as _SCORED
    from lucenenet_spark.plans.gate import _tsc

    return (
        _PRE
        + ","
        + _SCORED
        + f""",
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS ra
  FROM (
    SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q
    FROM ({_tsc(_RBO_TERM)})
  ) QUALIFY ra <= {_RBO_K}
),
tw AS (
  SELECT ln(cs.n / (ts.df + 1)) + 1 AS idf FROM ts, cs WHERE term = '{_RBO_TERM}'
),
tv AS (
  SELECT idf * ((1 / sqrt((idf * idf) * (1.0 * 1.0))) * 1.0) * idf AS value FROM tw
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id ASC) AS rb
  FROM (
    SELECT p.doc_id,
           CAST(floor((sqrt(p.tf) * tv.value * (1 / sqrt(dl.dl))) * 10000 + 0.5)
                AS BIGINT) AS score_q
    FROM post p JOIN dl USING (doc_id), tv
    WHERE p.term = '{_RBO_TERM}'
  ) QUALIFY rb <= {_RBO_K}
),
bo AS (SELECT ra.ra, rb.rb FROM ra JOIN rb USING (doc_id)),
ov AS (
  SELECT d, CAST(count(b.ra) AS BIGINT) AS ov
  FROM unnest(generate_series(1, {_RBO_K})) AS u(d)
  LEFT JOIN bo b ON b.ra <= u.d AND b.rb <= u.d
  GROUP BY d
),
contrib AS (
  SELECT CAST(floor(
           {1.0 - _RBO_P!r} * pow({_RBO_P!r}, CAST(d AS DOUBLE) - 1.0)
           * (CAST(ov AS DOUBLE) / CAST(d AS DOUBLE)) * 1000000000.0 + 0.5)
         AS BIGINT) AS cq
  FROM ov
)
SELECT CAST({_RBO_K} AS BIGINT) AS k,
       CAST(sum(cq) AS BIGINT) AS rbo_q9
FROM contrib
"""
    )


@gate("rbo_rank_overlap", _rbo_sql())
def rbo_rank_overlap(spark, sf_dir):
    """RBO@10 (p=0.9) between BM25 and ClassicSimilarity rankings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate import get_engine
    from lucenenet_spark.search.quality import rbo_overlap
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    idx, searcher, _ = get_engine(spark, sf_dir)
    classic = IndexSearcher(idx, mode="double", similarity="classic")

    def _ranked(s):
        scored = s.scored(TermQuery(_RBO_TERM)).select(
            "doc_id",
            F.floor(F.col("score") * F.lit(10000.0) + F.lit(0.5))
            .cast("long")
            .alias("score_q"),
        )
        w = Window.orderBy(F.desc("score_q"), F.asc("doc_id"))
        return scored.withColumn("rank", F.row_number().over(w))

    return rbo_overlap(_ranked(searcher), _ranked(classic), k=_RBO_K, p=_RBO_P)


# ----------------------------------------------------------------------
# robots_filter — RFC 9309 robots.txt evaluation: longest matching
# prefix wins, allow beats disallow on equal length, default allow.
# Deterministic synthetic rules/URLs exercise the allow-override,
# bare-disallow, host-conditional and no-rule branches. Oracle
# reproduces the generators and the window tie-break in SQL.
# ----------------------------------------------------------------------
_ROBOTS_SQL = """
WITH hosts AS (SELECT DISTINCT source AS host FROM documents),
rules AS (
  SELECT host, '/private' AS path_prefix, FALSE AS allow FROM hosts
  UNION ALL
  SELECT host, '/private/ok', TRUE FROM hosts
  WHERE CAST(substr(host, length(host), 1) AS INTEGER) % 2 = 0
  UNION ALL
  SELECT host, '/tmp', FALSE FROM hosts
  WHERE CAST(substr(host, length(host), 1) AS INTEGER) % 3 = 0
),
urls AS (
  SELECT doc_id, source AS host,
         CASE doc_id % 4
           WHEN 0 THEN '/private/ok/page' || doc_id
           WHEN 1 THEN '/private/page' || doc_id
           WHEN 2 THEN '/tmp/page' || doc_id
           ELSE '/public/page' || doc_id
         END AS path
  FROM documents
),
m AS (
  SELECT u.doc_id, r.allow, r.path_prefix,
         row_number() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.path_prefix) DESC, r.allow DESC
         ) AS rn
  FROM urls u JOIN rules r USING (host)
  WHERE starts_with(u.path, r.path_prefix)
)
SELECT u.doc_id, u.host, u.path,
       coalesce(b.allow, TRUE) AS allowed,
       coalesce(b.path_prefix, '') AS matched_prefix
FROM urls u
LEFT JOIN (SELECT doc_id, allow, path_prefix FROM m WHERE rn = 1) b
  USING (doc_id)
"""


@gate("robots_filter", _ROBOTS_SQL)
def robots_filter(spark, sf_dir):
    """RFC 9309 longest-match robots decision per URL."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.sources.robots import robots_filter as _rf
    from lucenenet_spark.sources.robots import synth_rules, synth_urls

    docs = _docs_table(spark, sf_dir)
    return _rf(synth_urls(docs), synth_rules(docs))


# ----------------------------------------------------------------------
# redirect_resolve — bounded-hop redirect-chain canonicalization (the
# HTTP client / crawler redirect-loop guard): 3 unrolled left joins
# against the deterministic redirect map, terminal flag for ids still
# redirecting after the budget. Oracle unrolls the same 3 hops.
# ----------------------------------------------------------------------
_RDR_SQL = """
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
rd AS (
  SELECT d.doc_id AS src,
         (d.doc_id + CAST(floor(nn.n / 3) AS BIGINT)) % nn.n AS target
  FROM documents d CROSS JOIN nn
  WHERE d.doc_id % 5 = 0
),
h0 AS (SELECT doc_id, doc_id AS cur, CAST(0 AS BIGINT) AS hops FROM documents),
h1 AS (
  SELECT h.doc_id, coalesce(r.target, h.cur) AS cur,
         h.hops + CASE WHEN r.target IS NOT NULL THEN 1 ELSE 0 END AS hops
  FROM h0 h LEFT JOIN rd r ON r.src = h.cur
),
h2 AS (
  SELECT h.doc_id, coalesce(r.target, h.cur) AS cur,
         h.hops + CASE WHEN r.target IS NOT NULL THEN 1 ELSE 0 END AS hops
  FROM h1 h LEFT JOIN rd r ON r.src = h.cur
),
h3 AS (
  SELECT h.doc_id, coalesce(r.target, h.cur) AS cur,
         h.hops + CASE WHEN r.target IS NOT NULL THEN 1 ELSE 0 END AS hops
  FROM h2 h LEFT JOIN rd r ON r.src = h.cur
)
SELECT h.doc_id, h.cur AS final_id, CAST(h.hops AS BIGINT) AS hops,
       r.src IS NULL AS terminal
FROM h3 h LEFT JOIN rd r ON r.src = h.cur
"""


@gate("redirect_resolve", _RDR_SQL)
def redirect_resolve(spark, sf_dir):
    """Bounded 3-hop redirect resolution with terminal/loop flag."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.sources.robots import resolve_redirects, synth_redirects

    docs = _docs_table(spark, sf_dir)
    return resolve_redirects(docs, synth_redirects(docs), max_hops=3)
