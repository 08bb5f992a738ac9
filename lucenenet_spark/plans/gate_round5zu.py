"""Gate registry round-5 part zu: posting-layout economics and tiered
serving — Elias-Fano size audit and the champion-list exactness
certificate.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, _SQL_SCORED, _tsc, gate, get_engine

# ----------------------------------------------------------------------
# elias_fano_audit — Vigna WSDM'13 quasi-succinct size vs the layout's
# measured delta-bit cost, all-integer arithmetic (bit_length = bin
# string length; no pow/log doubles).
# ----------------------------------------------------------------------
_EF_TOP = 10

_EF_SQL = SQL_PRELUDE + f""",
u AS (SELECT CAST(count(*) AS BIGINT) AS u FROM documents),
topt AS (
  SELECT term, df FROM (
    SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS r
    FROM ts) WHERE r <= {_EF_TOP}
),
ef AS (
  SELECT t.term, t.df,
         greatest(CAST(length(bin(u.u // t.df)) AS BIGINT) - 1, 0) AS l
  FROM topt t, u
),
efb AS (
  SELECT term, df,
         CAST(df * l + df
              + (u.u + (CAST(1 AS BIGINT) << CAST(l AS INTEGER)) - 1)
                // (CAST(1 AS BIGINT) << CAST(l AS INTEGER)) AS BIGINT) AS ef_bits
  FROM ef, u
),
gaps AS (
  SELECT p.term, p.doc_id,
         p.doc_id - coalesce(lag(p.doc_id) OVER (
           PARTITION BY p.term ORDER BY p.doc_id ASC), -1) AS gap
  FROM post p JOIN topt USING (term)
),
gb AS (
  SELECT term, CAST(sum(length(bin(gap))) AS BIGINT) AS gap_bits
  FROM gaps GROUP BY 1
)
SELECT e.term, CAST(e.df AS BIGINT) AS df, e.ef_bits, g.gap_bits
FROM efb e JOIN gb g USING (term)
"""


@gate("elias_fano_audit", _EF_SQL)
def elias_fano_audit(spark, sf_dir):
    """EF bits vs delta bits for the 10 heaviest posting lists."""
    from lucenenet_spark.functions.docid_layout import elias_fano_audit as _ef

    idx, _, _ = get_engine(spark, sf_dir)
    return _ef(idx, top_terms=_EF_TOP)


# ----------------------------------------------------------------------
# tiered_serving — IIR §7.1.3 champion lists with a proof: page served
# from the top-m impact tier, certified exact iff kth score >= max
# pruned impact.
# ----------------------------------------------------------------------
_TS_TERM = "vector"
_TS_M = 20
_TS_K = 10

_TS_SQL = SQL_PRELUDE + "," + _SQL_SCORED + f""",
imp AS (
  SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS impact_q,
         row_number() OVER (ORDER BY CAST(floor(score * 10000 + 0.5) AS BIGINT) DESC,
                            doc_id ASC) AS trk
  FROM ({_tsc(_TS_TERM)})
),
t2 AS (
  SELECT CAST(coalesce(max(impact_q), 0) AS BIGINT) AS tier2_max_q
  FROM imp WHERE trk > {_TS_M}
),
page AS (
  SELECT CAST(row_number() OVER (ORDER BY impact_q DESC, doc_id ASC) AS BIGINT)
           AS rank,
         doc_id, impact_q AS score_q
  FROM imp WHERE trk <= {_TS_M}
  QUALIFY rank <= {_TS_K}
),
kth AS (SELECT CAST(min(score_q) AS BIGINT) AS kth_q FROM page)
SELECT p.rank, p.doc_id, p.score_q, t2.tier2_max_q,
       CAST(CASE WHEN kth.kth_q >= t2.tier2_max_q THEN 1 ELSE 0 END AS BIGINT)
         AS certified
FROM page p, t2, kth
"""


@gate("tiered_serving", _TS_SQL)
def tiered_serving(spark, sf_dir):
    """Top-10 from the m=20 champion tier with exactness certificate."""
    from lucenenet_spark.search.sharded import tiered_serving_certificate

    idx, _, _ = get_engine(spark, sf_dir)
    return tiered_serving_certificate(idx, _TS_TERM, m=_TS_M, k=_TS_K)
