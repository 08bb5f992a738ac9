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
