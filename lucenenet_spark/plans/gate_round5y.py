"""Gate registry round-5 part y: interleaving credit assignment,
freshness-driven recrawl rate estimation, and registrable-domain
(eTLD+1) extraction.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, get_engine
from lucenenet_spark.plans.gate_round5x import _tdi_cte_chain

# ----------------------------------------------------------------------
# interleave_credit — the second half of the Radlinski CIKM'08 online
# protocol: a deterministic click model (click iff tf(term) >= 2, the
# trec_judgments relevance convention) over the interleaved page; each
# click credits the contributing team.  Oracle replays the recursive-
# CTE interleave then joins postings for the clicks.
# ----------------------------------------------------------------------
_CREDIT_TERM = "vector"
_CREDIT_MIN_TF = 2

_CREDIT_SQL = _tdi_cte_chain() + f""",
page AS (
  SELECT unnest(docs) AS doc_id,
         teams[generate_subscripts(docs, 1)] AS team
  FROM fin
),
cl AS (
  SELECT p.doc_id, p.team
  FROM page p JOIN post ON post.doc_id = p.doc_id
  WHERE post.term = '{_CREDIT_TERM}' AND post.tf >= {_CREDIT_MIN_TF}
)
SELECT CAST(coalesce(sum(CASE WHEN team = 'A' THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS clicks_a,
       CAST(coalesce(sum(CASE WHEN team = 'B' THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS clicks_b,
       CASE WHEN coalesce(sum(CASE WHEN team = 'A' THEN 1 ELSE 0 END), 0)
               > coalesce(sum(CASE WHEN team = 'B' THEN 1 ELSE 0 END), 0) THEN 'A'
            WHEN coalesce(sum(CASE WHEN team = 'B' THEN 1 ELSE 0 END), 0)
               > coalesce(sum(CASE WHEN team = 'A' THEN 1 ELSE 0 END), 0) THEN 'B'
            ELSE 'tie' END AS winner
FROM cl
"""


@gate("interleave_credit", _CREDIT_SQL)
def interleave_credit(spark, sf_dir):
    """Click-credit preference over the BM25-vs-Classic interleaved
    page (deterministic tf>=2 click model)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.plans.gate_round5x import team_draft_interleave as _tdi_gate
    from lucenenet_spark.search.interleave import interleave_credit as _credit

    idx, _, _ = get_engine(spark, sf_dir)
    page = _tdi_gate(spark, sf_dir)
    clicks = idx.postings.filter(
        (F.col("field") == idx.default_field)
        & (F.col("term") == _CREDIT_TERM)
        & (F.col("tf") >= _CREDIT_MIN_TF)
    ).select("doc_id")
    return _credit(page, clicks)


# ----------------------------------------------------------------------
# recrawl_rates — Cho & Garcia-Molina TOIT'03 bias-corrected change-
# rate estimator lambda = -ln((n - c + 0.5)/(n + 0.5)) over a
# deterministic synthetic visit history; the recrawl budget allocator.
# ----------------------------------------------------------------------
_RECRAWL_OBS = 8
_RECRAWL_TOP = 20

_RECRAWL_SQL = f"""
SELECT doc_id,
       CAST(doc_id % {_RECRAWL_OBS + 1} AS BIGINT) AS changes,
       CAST({_RECRAWL_OBS} AS BIGINT) AS obs,
       CAST(floor(-ln(({_RECRAWL_OBS} - (doc_id % {_RECRAWL_OBS + 1}) + 0.5)
                      / {_RECRAWL_OBS + 0.5}) * 1000000.0 + 0.5) AS BIGINT)
         AS lambda_q6
FROM documents
ORDER BY lambda_q6 DESC, doc_id ASC LIMIT {_RECRAWL_TOP}
"""


@gate("recrawl_rates", _RECRAWL_SQL)
def recrawl_rates(spark, sf_dir):
    """Top-20 change-rate estimates for recrawl prioritization."""
    from lucenenet_spark.functions.crawl import recrawl_rates as _rr
    from lucenenet_spark.plans.gate import _docs_table

    return _rr(_docs_table(spark, sf_dir), obs=_RECRAWL_OBS, top=_RECRAWL_TOP)


# ----------------------------------------------------------------------
# registrable_domain — publicsuffix.org eTLD+1 extraction with
# longest-suffix precedence ('co.uk' beats 'uk') and the PSL '*'
# fallback (unknown TLD -> last two labels).  Synthetic hosts cover a
# 3-label .com, a 4-label ccTLD, a unique-per-doc .org registrable,
# and an unlisted TLD.
# ----------------------------------------------------------------------
_SUFFIXES = ["com", "co.uk", "uk", "org"]
_RD_TOP = 25

_HOST_CASE_SQL = """CASE doc_id % 4
  WHEN 0 THEN 'w' || doc_id || '.shop.com'
  WHEN 1 THEN 'x' || doc_id || '.news.co.uk'
  WHEN 2 THEN 'cdn.media' || doc_id || '.org'
  ELSE 'node' || doc_id || '.cluster.internal'
END"""


def _rd_sql() -> str:
    import re as _re

    branches = []
    for s in sorted(_SUFFIXES, key=lambda x: (x.count("."), len(x)), reverse=True):
        esc = _re.escape(s).replace("'", "''")
        branches.append(f"WHEN host = '{s}' THEN NULL")
        branches.append(
            f"WHEN regexp_matches(host, '\\.{esc}$') THEN "
            f"regexp_extract(host, '([^.]+)\\.{esc}$', 1) || '.{s}'"
        )
    branches.append(
        "WHEN regexp_matches(host, '^[^.]+\\.[^.]+') THEN "
        "regexp_extract(host, '([^.]+\\.[^.]+)$', 1)"
    )
    case = "CASE\n  " + "\n  ".join(branches) + "\n  ELSE NULL END"
    return f"""
WITH hosts AS (
  SELECT doc_id, {_HOST_CASE_SQL} AS host FROM documents
),
rd AS (
  SELECT doc_id, {case} AS registrable FROM hosts
)
SELECT registrable,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM rd GROUP BY registrable
ORDER BY n DESC, registrable ASC LIMIT {_RD_TOP}
"""


@gate("registrable_domain", _rd_sql())
def registrable_domain(spark, sf_dir):
    """Site grouping by eTLD+1 with longest-suffix precedence."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.urls import registrable_domain_col
    from lucenenet_spark.plans.gate import _docs_table

    docs = _docs_table(spark, sf_dir)
    branch = F.col("doc_id") % 4
    host = (
        F.when(branch == 0, F.concat(F.lit("w"), F.col("doc_id"), F.lit(".shop.com")))
        .when(branch == 1, F.concat(F.lit("x"), F.col("doc_id"), F.lit(".news.co.uk")))
        .when(branch == 2, F.concat(F.lit("cdn.media"), F.col("doc_id"), F.lit(".org")))
        .otherwise(F.concat(F.lit("node"), F.col("doc_id"), F.lit(".cluster.internal")))
    )
    rd = docs.select(
        "doc_id", registrable_domain_col(host, _SUFFIXES).alias("registrable")
    )
    return (
        rd.groupBy("registrable")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        .orderBy(F.desc("n"), F.asc("registrable"))
        .limit(_RD_TOP)
    )
