"""Gate registry round-5 part zj: RAG-layer retrieval — max-passage
scoring and overlapping chunk export.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

# ----------------------------------------------------------------------
# max_passage_topk — Liu & Croft CIKM'02 / Callan SIGIR'94 MaxPsg:
# rank docs by their best 50-position passage; passage tf and length
# come straight from the positional postings (no re-tokenization).
# ----------------------------------------------------------------------
_MP_TERM = "vector"
_MP_K = 10
_MP_LEN = 50

_MP_SQL = SQL_PRELUDE + f""",
ptf AS (
  SELECT doc_id, CAST(floor(pos / {_MP_LEN}) AS BIGINT) AS passage_id,
         CAST(count(*) AS BIGINT) AS passage_tf
  FROM tokf WHERE term = '{_MP_TERM}' GROUP BY 1, 2
),
pl AS (
  SELECT doc_id, CAST(floor(pos / {_MP_LEN}) AS BIGINT) AS passage_id,
         CAST(count(*) AS BIGINT) AS plen
  FROM tokf GROUP BY 1, 2
),
psc AS (
  SELECT p.doc_id, p.passage_id, p.passage_tf,
         CAST(floor(
           ln(1 + (cs.n - ts.df + 0.5) / (ts.df + 0.5)) * 2.2 * p.passage_tf
           / (p.passage_tf + 1.2 * (0.25 + 0.75 * pl.plen / {float(_MP_LEN)!r}))
           * 10000 + 0.5) AS BIGINT) AS score_q4
  FROM ptf p
  JOIN pl USING (doc_id, passage_id)
  JOIN ts ON ts.term = '{_MP_TERM}'
  CROSS JOIN cs
),
winners AS (
  SELECT doc_id, passage_id, passage_tf, score_q4,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q4 DESC, passage_id ASC) AS prk
  FROM psc
)
SELECT CAST(row_number() OVER (ORDER BY score_q4 DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, passage_id, passage_tf, score_q4
FROM winners WHERE prk = 1
QUALIFY rank <= {_MP_K}
"""


@gate("max_passage_topk", _MP_SQL)
def max_passage_topk(spark, sf_dir):
    """Top-10 docs by best 50-position passage for one term."""
    from lucenenet_spark.search.passages import max_passage_topk as _mp

    idx, _, _ = get_engine(spark, sf_dir)
    return _mp(idx, _MP_TERM, k=_MP_K, passage_len=_MP_LEN)


# ----------------------------------------------------------------------
# chunk_export — deterministic overlapping token chunks (size 64,
# stride 48): the RAG ingestion unit, pure Column slices.
# ----------------------------------------------------------------------
_CH_SIZE = 64
_CH_STRIDE = 48

_CHUNK_SQL = f"""
WITH nodes AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
ch AS (
  SELECT doc_id, CAST(u.c AS BIGINT) AS chunk_id,
         toks[u.c * {_CH_STRIDE} + 1 : u.c * {_CH_STRIDE} + {_CH_SIZE}] AS words
  FROM nodes,
       unnest(generate_series(0,
         CAST(ceil(length(toks) / {float(_CH_STRIDE)!r}) AS BIGINT) - 1)) AS u(c)
)
SELECT doc_id, chunk_id,
       CAST(length(words) AS BIGINT) AS n_tokens,
       array_to_string(words, ' ') AS chunk
FROM ch WHERE length(words) > 0
"""


@gate("chunk_export", _CHUNK_SQL)
def chunk_export(spark, sf_dir):
    """Overlapping 64/48 token chunks for every document."""
    from lucenenet_spark.plans.gate import _docs_table
    from lucenenet_spark.search.passages import chunk_export as _ce

    return _ce(_docs_table(spark, sf_dir), size=_CH_SIZE, stride=_CH_STRIDE)
