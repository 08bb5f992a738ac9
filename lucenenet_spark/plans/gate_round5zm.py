"""Gate registry round-5 part zm: tokenizer training and extractive
summarization — BPE merge learning and LexRank sentence centrality.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import _docs_table, gate

# ----------------------------------------------------------------------
# bpe_top_merges — Sennrich ACL'16 BPE: first 3 merges over the corpus
# word-frequency table.  Symbols ride a double-space-delimited string;
# each round is pair-count -> 1-row argmax -> replace, reproduced
# round-for-round in the oracle (both engines' replace() scans
# left-to-right non-overlapping, keeping chained merges greedy).
# ----------------------------------------------------------------------
_BPE_ROUNDS = 3

_BPE_PAIRS = """
  SELECT t[u.i] AS w1, t[u.i + 1] AS w2, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM (SELECT string_split(trim(sym), '  ') AS t, cnt FROM {src}) s,
       unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
  GROUP BY 1, 2
"""

_BPE_SQL = (
    """
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents) GROUP BY w
),
sym1 AS (
  SELECT ' ' || array_to_string(string_split(w, ''), '  ') || ' ' AS sym, cnt
  FROM words
),
pairs1 AS ("""
    + _BPE_PAIRS.format(src="sym1")
    + """),
win1 AS (SELECT * FROM pairs1 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1),
sym2 AS (
  SELECT replace(s.sym, ' ' || w.w1 || '  ' || w.w2 || ' ',
                 ' ' || w.w1 || w.w2 || ' ') AS sym, s.cnt
  FROM sym1 s CROSS JOIN win1 w
),
pairs2 AS ("""
    + _BPE_PAIRS.format(src="sym2")
    + """),
win2 AS (SELECT * FROM pairs2 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1),
sym3 AS (
  SELECT replace(s.sym, ' ' || w.w1 || '  ' || w.w2 || ' ',
                 ' ' || w.w1 || w.w2 || ' ') AS sym, s.cnt
  FROM sym2 s CROSS JOIN win2 w
),
pairs3 AS ("""
    + _BPE_PAIRS.format(src="sym3")
    + """),
win3 AS (SELECT * FROM pairs3 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1)
SELECT CAST(1 AS BIGINT) AS round, w1, w2, pair_count FROM win1
UNION ALL
SELECT CAST(2 AS BIGINT), w1, w2, pair_count FROM win2
UNION ALL
SELECT CAST(3 AS BIGINT), w1, w2, pair_count FROM win3
"""
)


@gate("bpe_top_merges", _BPE_SQL)
def bpe_top_merges(spark, sf_dir):
    """First 3 BPE merges (round, w1, w2, pair_count) from the corpus."""
    from lucenenet_spark.functions.bpe import bpe_learn_merges

    return bpe_learn_merges(_docs_table(spark, sf_dir), n_merges=_BPE_ROUNDS)


# ----------------------------------------------------------------------
# lexrank_top_sentence — Erkan & Radev JAIR'04 degree-centrality
# LexRank over 15-token sentences of the doc_id % 11 == 0 documents;
# integer dot/norms, one quantized cosine, integer degrees.
# ----------------------------------------------------------------------
_LR_MOD = 11
_LR_LEN = 15
_LR_T = 100000  # cos >= 0.1 in q6

_LR_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST(floor((u.i - 1) / {_LR_LEN}) AS BIGINT) AS sent_id, t[u.i] AS term
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE doc_id % {_LR_MOD} = 0) d,
       unnest(generate_series(1, length(t))) AS u(i)
),
stf AS (
  SELECT doc_id, sent_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2, 3
),
norms AS (
  SELECT doc_id, sent_id, CAST(sum(tf * tf) AS BIGINT) AS n2
  FROM stf GROUP BY 1, 2
),
dots AS (
  SELECT a.doc_id, a.sent_id AS sa, b.sent_id AS sb,
         CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
  FROM stf a
  JOIN stf b ON a.doc_id = b.doc_id AND a.term = b.term AND a.sent_id < b.sent_id
  GROUP BY 1, 2, 3
),
edges AS (
  SELECT d.doc_id, sa, sb
  FROM dots d
  JOIN norms na ON na.doc_id = d.doc_id AND na.sent_id = d.sa
  JOIN norms nb ON nb.doc_id = d.doc_id AND nb.sent_id = d.sb
  WHERE CAST(floor(CAST(dot AS DOUBLE)
          / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          * 1000000.0 + 0.5) AS BIGINT) >= {_LR_T}
),
ends AS (
  SELECT doc_id, sa AS sent_id FROM edges
  UNION ALL
  SELECT doc_id, sb AS sent_id FROM edges
),
deg AS (
  SELECT doc_id, sent_id, CAST(count(*) AS BIGINT) AS degree
  FROM ends GROUP BY 1, 2
),
sent AS (
  SELECT n.doc_id, n.sent_id, CAST(coalesce(d.degree, 0) AS BIGINT) AS degree
  FROM norms n LEFT JOIN deg d USING (doc_id, sent_id)
),
win AS (
  SELECT doc_id, sent_id, degree,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY degree DESC, sent_id ASC) AS rk
  FROM sent
),
ns AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents FROM norms GROUP BY 1)
SELECT w.doc_id, w.sent_id, w.degree, ns.n_sents
FROM win w JOIN ns USING (doc_id) WHERE rk = 1
"""


@gate("lexrank_top_sentence", _LR_SQL)
def lexrank_top_sentence(spark, sf_dir):
    """Most central 15-token sentence per doc_id%11 document."""
    import pyspark.sql.functions as F

    from lucenenet_spark.functions.summarize import lexrank_top_sentences

    docs = _docs_table(spark, sf_dir).filter(F.col("doc_id") % _LR_MOD == 0)
    return lexrank_top_sentences(docs, sent_len=_LR_LEN, threshold_q6=_LR_T)
