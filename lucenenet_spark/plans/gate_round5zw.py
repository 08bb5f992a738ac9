"""Gate registry round-5 part zw: corpus-growth statistics — Heaps'-law
vocabulary fit and the Good-Turing smoothing table.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import gate, _docs_table

_HL_CP = 10

# ----------------------------------------------------------------------
# heaps_law_fit — V(T) = k·T^β over 10 document-rank checkpoints;
# zipf's quantize-then-integer-sum regression discipline.
# ----------------------------------------------------------------------
_HL_SQL = f"""
WITH toks AS (
  SELECT doc_id AS d,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
sizes AS (SELECT d, CAST(count(*) AS BIGINT) AS ntok FROM toks GROUP BY 1),
firstd AS (SELECT term, min(d) AS d FROM toks GROUP BY 1),
news AS (SELECT d, CAST(count(*) AS BIGINT) AS new_terms FROM firstd GROUP BY 1),
cum AS (
  SELECT CAST(row_number() OVER (ORDER BY s.d ASC) AS BIGINT) AS rank,
         CAST(sum(s.ntok) OVER (ORDER BY s.d ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS t_cum,
         CAST(sum(coalesce(n.new_terms, 0)) OVER (ORDER BY s.d ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS v_cum
  FROM sizes s LEFT JOIN news n USING (d)
),
nd AS (SELECT CAST(max(rank) AS BIGINT) AS nd FROM cum),
bounds AS (
  SELECT DISTINCT CAST(ceil(nd.nd * u.i / {_HL_CP}) AS BIGINT) AS rank
  FROM nd, unnest(generate_series(1, {_HL_CP})) AS u(i)
),
pts AS (
  SELECT CAST(floor(ln(CAST(t_cum AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS xq,
         CAST(floor(ln(CAST(v_cum AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS yq,
         t_cum, v_cum
  FROM cum JOIN bounds USING (rank)
),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xq) AS BIGINT) AS sx,
         CAST(sum(yq) AS BIGINT) AS sy,
         CAST(sum(xq * yq) AS BIGINT) AS sxy,
         CAST(sum(xq * xq) AS BIGINT) AS sxx,
         CAST(max(t_cum) AS BIGINT) AS total_tokens,
         CAST(max(v_cum) AS BIGINT) AS vocab
  FROM pts
)
SELECT n AS n_checkpoints, total_tokens, vocab,
       CAST(floor(
         ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
         * 1000000.0 + 0.5) AS BIGINT) AS slope_q,
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


@gate("heaps_law_fit", _HL_SQL)
def heaps_law_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit over 10 corpus checkpoints."""
    from lucenenet_spark.functions.textstats import heaps_law_fit as _hl

    return _hl(_docs_table(spark, sf_dir), checkpoints=_HL_CP)


# ----------------------------------------------------------------------
# good_turing_counts — bigram-event Good'53 / Gale & Sampson'95 N_r table, smoothed
# r* and unseen mass p0, exact integers + two quantized divisions.
# ----------------------------------------------------------------------
_GT_MAXR = 5

_GT_SQL = f"""
WITH tl AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
freqs AS (
  SELECT w, CAST(count(*) AS BIGINT) AS r FROM (
    SELECT t[u.i] || ' ' || t[u.i + 1] AS w
    FROM tl, unnest(generate_series(1, length(t) - 1)) AS u(i)
    WHERE length(t) >= 2) GROUP BY w
),
nr AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM freqs GROUP BY 1),
tot AS (
  SELECT CAST(sum(r) AS BIGINT) AS total_tokens,
         CAST(coalesce(sum(CASE WHEN r = 1 THEN 1 END), 0) AS BIGINT) AS n1
  FROM freqs
)
SELECT CAST(b.r AS BIGINT) AS r, b.n_r,
       CAST(coalesce(x.n_r, 0) AS BIGINT) AS n_r1,
       CAST(floor(CAST(b.r + 1 AS DOUBLE) * CAST(coalesce(x.n_r, 0) AS DOUBLE)
                  / CAST(b.n_r AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS r_star_q6,
       t.total_tokens,
       CAST(floor(CAST(t.n1 AS DOUBLE) / CAST(t.total_tokens AS DOUBLE)
                  * 1000000000.0 + 0.5) AS BIGINT) AS p0_q9
FROM nr b
LEFT JOIN nr x ON x.r = b.r + 1
CROSS JOIN tot t
WHERE b.r <= {_GT_MAXR}
"""


@gate("good_turing_counts", _GT_SQL)
def good_turing_counts(spark, sf_dir):
    """Good-Turing N_r table with smoothed r* and unseen mass."""
    from lucenenet_spark.functions.textstats import good_turing_counts as _gt

    return _gt(_docs_table(spark, sf_dir), max_r=_GT_MAXR)
