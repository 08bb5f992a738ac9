"""Gate registry round-5 part zi: the Sequential Dependence Model —
the MRF term-dependency baseline over the positional postings.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine
from lucenenet_spark.search.sdm import LAMBDA_O, LAMBDA_T, LAMBDA_U, UW_WIN

_SDM_T1 = "vector"
_SDM_T2 = "merge"
_SDM_K = 10
_SDM_MU = 2500.0

_SDM_SQL = SQL_PRELUDE + f""",
px AS (SELECT doc_id, pos FROM tokf WHERE term = '{_SDM_T1}'),
py AS (SELECT doc_id, pos FROM tokf WHERE term = '{_SDM_T2}'),
od AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS c_o
  FROM px a JOIN py b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.doc_id
),
uw AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS c_u
  FROM px a JOIN py b ON b.doc_id = a.doc_id
        AND b.pos - a.pos > -{UW_WIN} AND b.pos - a.pos < {UW_WIN}
  GROUP BY a.doc_id
),
t1p AS (SELECT doc_id, tf AS tf1 FROM post WHERE term = '{_SDM_T1}'),
t2p AS (SELECT doc_id, tf AS tf2 FROM post WHERE term = '{_SDM_T2}'),
cand AS (
  SELECT coalesce(t1p.doc_id, t2p.doc_id) AS doc_id,
         CAST(coalesce(tf1, 0) AS BIGINT) AS tf1,
         CAST(coalesce(tf2, 0) AS BIGINT) AS tf2
  FROM t1p FULL OUTER JOIN t2p ON t1p.doc_id = t2p.doc_id
),
fx AS (
  SELECT c.doc_id, CAST(dl.dl AS DOUBLE) AS dl, c.tf1, c.tf2,
         CAST(coalesce(od.c_o, 0) AS BIGINT) AS c_o,
         CAST(coalesce(uw.c_u, 0) AS BIGINT) AS c_u
  FROM cand c
  JOIN dl USING (doc_id)
  LEFT JOIN od USING (doc_id)
  LEFT JOIN uw USING (doc_id)
),
cfs AS (
  SELECT (SELECT CAST(ttf AS DOUBLE) FROM ts WHERE term = '{_SDM_T1}') AS cf1,
         (SELECT CAST(ttf AS DOUBLE) FROM ts WHERE term = '{_SDM_T2}') AS cf2,
         (SELECT CAST(coalesce(sum(c_o), 0) AS DOUBLE) FROM fx) AS cfo,
         (SELECT CAST(coalesce(sum(c_u), 0) AS DOUBLE) FROM fx) AS cfu
),
sc AS (
  SELECT f.doc_id,
         {LAMBDA_T!r} * (
           ln((f.tf1 + {_SDM_MU!r} * (greatest(cfs.cf1, 0.5) / cs.sttf))
              / (f.dl + {_SDM_MU!r}))
           + ln((f.tf2 + {_SDM_MU!r} * (greatest(cfs.cf2, 0.5) / cs.sttf))
                / (f.dl + {_SDM_MU!r}))
         )
         + {LAMBDA_O!r} * ln((f.c_o + {_SDM_MU!r} * (greatest(cfs.cfo, 0.5) / cs.sttf))
                             / (f.dl + {_SDM_MU!r}))
         + {LAMBDA_U!r} * ln((f.c_u + {_SDM_MU!r} * (greatest(cfs.cfu, 0.5) / cs.sttf))
                             / (f.dl + {_SDM_MU!r}))
           AS score
  FROM fx f, cfs, cs
)
SELECT CAST(row_number() OVER (ORDER BY score_q4 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, score_q4
FROM (SELECT doc_id, CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q4 FROM sc)
QUALIFY rank <= {_SDM_K}
"""


@gate("sdm_topk", _SDM_SQL)
def sdm_topk(spark, sf_dir):
    """SDM top-10 for the two-term query (vector, merge)."""
    from lucenenet_spark.search.sdm import sdm_topk as _sdm

    idx, _, _ = get_engine(spark, sf_dir)
    return _sdm(idx, _SDM_T1, _SDM_T2, k=_SDM_K, mu=_SDM_MU)
