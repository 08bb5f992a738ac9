"""Gate registry round-5 part zzza: exact-similarity self-join via prefix
filtering (AllPairs/PPJoin) and unigram-LM (SentencePiece-style) Viterbi
subword tokenization.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# prefix_filter_join — EXACT Jaccard >= 1/2 pair join over 3-gram
# shingles, engine side via Bayardo WWW'07 prefix filtering; oracle is
# the INDEPENDENT brute-force all-pairs join (so the gate proves the
# prefix filter loses no pair and admits no extra).
# ----------------------------------------------------------------------
_PFJ_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
sh AS (
  SELECT DISTINCT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tok a
  JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS s FROM sh GROUP BY doc_id),
pin AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.i AS inter,
       sa.s + sb.s - p.i AS uni,
       (20000 * p.i + (sa.s + sb.s - p.i)) // (2 * (sa.s + sb.s - p.i)) AS jacc_q4
FROM pin p
JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE 3 * p.i >= sa.s + sb.s
ORDER BY doc_a, doc_b
"""


@gate("prefix_filter_join", _PFJ_SQL)
def prefix_filter_join(spark, sf_dir):
    """Exact J>=0.5 similarity self-join, prefix-filtered (WWW'07)."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.dedup import prefix_filter_pairs

    _, _, docs = get_engine(spark, sf_dir)
    return prefix_filter_pairs(docs, n=3, t_num=1, t_den=2).orderBy(
        "doc_a", "doc_b"
    )


# ----------------------------------------------------------------------
# unigram_lm_tokenize — Kudo ACL'18 unigram-LM Viterbi segmentation of
# every distinct word under a deterministic piece vocabulary (chars +
# top-12 frequent 2..4-grams, quantized -ln costs); oracle replays the
# exact recurrence as an unrolled DuckDB CTE chain.
# ----------------------------------------------------------------------
_UL_TOPK = 12
_UL_MAXP = 4
_UL_MAXW = 10

from lucenenet_spark.functions.unigram_lm import unigram_lm_oracle_sql  # noqa: E402

_UL_SQL = SQL_PRELUDE + ",\n" + unigram_lm_oracle_sql(
    top_k=_UL_TOPK, max_piece_len=_UL_MAXP, max_word_len=_UL_MAXW, limit=30
)


@gate("unigram_lm_tokenize", _UL_SQL)
def unigram_lm_tokenize(spark, sf_dir):
    """Unigram-LM Viterbi subword segmentation, top-30 words by freq."""
    from pyspark.sql import functions as F

    from lucenenet_spark.functions.unigram_lm import unigram_lm_segment

    _, _, docs = get_engine(spark, sf_dir)
    return (
        unigram_lm_segment(
            docs, top_k=_UL_TOPK, max_piece_len=_UL_MAXP, max_word_len=_UL_MAXW
        )
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(30)
    )
