"""Gate registry round-5 part zn: BPE tokenizer application and
noisy-channel context-sensitive spelling correction.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import _docs_table, gate

# ----------------------------------------------------------------------
# bpe_token_vocab — apply the 3 learned merges (Sennrich ACL'16 §3.2)
# and rank the resulting subword vocabulary head: the segmentation the
# trained tokenizer actually emits.  Oracle replays all three
# train+apply rounds, then counts symbols.
# ----------------------------------------------------------------------
_BPV_K = 10

_BPE_PAIRS = """
  SELECT t[u.i] AS w1, t[u.i + 1] AS w2, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM (SELECT string_split(trim(sym), '  ') AS t, cnt FROM {src}) s,
       unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
  GROUP BY 1, 2
"""

_APPLY = """
  SELECT replace(s.sym, ' ' || w.w1 || '  ' || w.w2 || ' ',
                 ' ' || w.w1 || w.w2 || ' ') AS sym, s.cnt
  FROM {src} s CROSS JOIN {win} w
"""

_BPV_SQL = (
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
sym2 AS ("""
    + _APPLY.format(src="sym1", win="win1")
    + """),
pairs2 AS ("""
    + _BPE_PAIRS.format(src="sym2")
    + """),
win2 AS (SELECT * FROM pairs2 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1),
sym3 AS ("""
    + _APPLY.format(src="sym2", win="win2")
    + """),
pairs3 AS ("""
    + _BPE_PAIRS.format(src="sym3")
    + """),
win3 AS (SELECT * FROM pairs3 ORDER BY pair_count DESC, w1 ASC, w2 ASC LIMIT 1),
sym4 AS ("""
    + _APPLY.format(src="sym3", win="win3")
    + f"""),
tok AS (
  SELECT unnest(string_split(trim(sym), '  ')) AS token, cnt FROM sym4
),
tc AS (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS token_count FROM tok GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY token_count DESC, token ASC) AS BIGINT) AS rank,
       token, token_count
FROM tc
QUALIFY rank <= {_BPV_K}
"""
)


@gate("bpe_token_vocab", _BPV_SQL)
def bpe_token_vocab(spark, sf_dir):
    """Top-10 subword tokens after applying the 3 learned BPE merges."""
    from lucenenet_spark.functions.bpe import bpe_token_stats

    return bpe_token_stats(_docs_table(spark, sf_dir), n_merges=3, k=_BPV_K)


# ----------------------------------------------------------------------
# context_spell — noisy-channel correction (Kernighan COLING'90) of
# 'sro' in the left context 'the': KN bigram source model minus a
# 5-nat-per-edit channel penalty, candidates length-band-pruned before
# the levenshtein compute.
# ----------------------------------------------------------------------
_CS_PREV = "the"
_CS_MISS = "sro"
_CS_K = 5
_CS_ME = 2
_CS_PEN = 5000000

_CS_SQL = f"""
WITH toksl AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents
),
pairs AS (
  SELECT t[u.i] AS w1, t[u.i + 1] AS w2
  FROM toksl, unnest(generate_series(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 2
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM pairs GROUP BY 1, 2),
ctx AS (
  SELECT CAST(sum(cb) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1f
  FROM big WHERE w1 = '{_CS_PREV}'
),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM big GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM big),
vocab AS (
  SELECT w, CAST(levenshtein(w, '{_CS_MISS}') AS BIGINT) AS dist FROM (
    SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
    FROM documents)
  WHERE abs(length(w) - {len(_CS_MISS)}) <= {_CS_ME}
    AND levenshtein(w, '{_CS_MISS}') <= {_CS_ME}
),
cand AS (
  SELECT v.w, v.dist, CAST(coalesce(b.cb, 0) AS BIGINT) AS cb, c.c1, c.n1f,
         CAST(coalesce(o.n1b, 0) AS BIGINT) AS n1b, n.nt
  FROM vocab v
  LEFT JOIN (SELECT w2 AS w, cb FROM big WHERE w1 = '{_CS_PREV}') b USING (w)
  CROSS JOIN ctx c
  LEFT JOIN cont o ON o.w2 = v.w
  CROSS JOIN nt n
  WHERE coalesce(b.cb, 0) > 0 OR coalesce(o.n1b, 0) > 0
),
sc AS (
  SELECT w AS candidate, dist,
    CAST(floor(ln(
      greatest(CAST(cb AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)
      + (0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
        * (CAST(n1b AS DOUBLE) / CAST(nt AS DOUBLE))
    ) * 1000000.0 + 0.5) AS BIGINT) AS lp_q6
  FROM cand
),
fin AS (
  SELECT candidate, dist, lp_q6,
         CAST(lp_q6 - {_CS_PEN} * dist AS BIGINT) AS score_q6
  FROM sc
)
SELECT CAST(row_number() OVER (ORDER BY score_q6 DESC, candidate ASC) AS BIGINT) AS rank,
       candidate, dist, lp_q6, score_q6
FROM fin
QUALIFY rank <= {_CS_K}
"""


@gate("context_spell", _CS_SQL)
def context_spell(spark, sf_dir):
    """Top-5 context-aware corrections of 'sro' after 'the'."""
    from lucenenet_spark.functions.lm_quality import context_spell_correct

    return context_spell_correct(
        _docs_table(spark, sf_dir), _CS_PREV, _CS_MISS,
        k=_CS_K, max_edits=_CS_ME, edit_penalty_q6=_CS_PEN,
    )
