"""Unigram-language-model (SentencePiece-style) subword tokenization
(Kudo, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates", ACL 2018) — the OTHER major
tokenizer-training family beside BPE (functions/bpe.py).

Where BPE builds its vocabulary bottom-up by greedy pair merging, the
unigram LM starts from a candidate piece inventory with unigram
probabilities and segments each word by VITERBI: the segmentation
minimizing the summed piece costs -ln p(piece).  This module runs a
deterministic instance fully inside Spark:

* Vocabulary = every single character (so segmentation always exists)
  plus the ``top_k`` most frequent character n-grams (2..max_piece_len),
  counted over the word-TYPE table weighted by word frequency — exact
  integer counts, ties broken (count DESC, piece ASC).
* Piece cost = floor(-ln(cnt / tot) * 1e6 + 0.5), ONE quantized ln per
  piece (the established cross-engine discipline: both engines compute
  ln of the same rational).
* Viterbi DP is UNROLLED over word positions (words here are bounded;
  the unroll depth is ``max_word_len``): best[i] = min over piece
  lengths l of best[i-l] + cost(word[i-l+1 .. i]); ties prefer the
  LONGER final piece.  Backpointers are piece lengths, and the
  backtrace is a second unrolled fold producing the piece string.
  Everything is Column expressions over the word table — no UDF, no
  driver loop over data (the vocab is a BOUNDED collect: |alphabet| +
  top_k entries, the minhash_perms/ivf_centroids literal pattern).

Scale: the state is the word-type table (|vocab| rows, ~10^7 at web
scale, NOT the corpus) exactly like the distributed BPE trainer; the
DP adds O(max_word_len * max_piece_len) column expressions per row,
all inside whole-stage codegen.  Applying the trained tokenizer to a
corpus is the same DP mapped over distinct words then joined back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_lm_vocab", "unigram_lm_segment", "unigram_lm_oracle_sql"]

_BIG = 10**15


def _word_types(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def unigram_lm_vocab(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 12,
    max_piece_len: int = 4,
) -> list[tuple[str, int]]:
    """Derive the piece vocabulary with quantized costs.

    Returns [(piece, cost_q6)] — single chars first, then the top_k
    n-grams; bounded (|alphabet| + top_k rows), safe to collect.
    """
    words = _word_types(docs, text_col)
    chars = (
        words.select(
            F.explode(F.array_remove(F.split("w", ""), "")).alias("piece"), "freq"
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    grams = None
    for n in range(2, max_piece_len + 1):
        g = words.select(
            F.explode(
                F.when(
                    F.length("w") >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.length("w") - F.lit(n - 1)),
                        lambda i: F.substr(F.col("w"), i, F.lit(n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("piece"),
            "freq",
        )
        grams = g if grams is None else grams.unionByName(g)
    top = (
        grams.groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(top_k)
    )
    rows = chars.unionByName(top).collect()
    tot = float(sum(r["cnt"] for r in rows))
    return sorted(
        (r["piece"], int(math.floor(-math.log(r["cnt"] / tot) * 1e6 + 0.5)))
        for r in rows
    )


def unigram_lm_segment(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 12,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Viterbi-segment every distinct word under the trained unigram LM.

    Output: (word, freq, cost_q6, n_pieces, seg) with seg the pieces
    joined by '|'.  Words longer than max_word_len raise (the unroll
    depth is the documented bound — raise it for longer-word corpora).
    """
    vocab = unigram_lm_vocab(docs, text_col, top_k, max_piece_len)
    kv: list[F.Column] = []
    for piece, cost in vocab:
        kv.extend([F.lit(piece), F.lit(cost)])
    cost_map = F.create_map(*kv)

    words = _word_types(docs, text_col)
    L = max_word_len
    # Unroll guard folded into the load-bearing len column (so pruning can't
    # drop it): the DP below is only correct up to depth L — fail loudly at
    # runtime on longer words instead of mis-segmenting them.
    df = words.withColumn(
        "len",
        F.when(
            F.assert_true(
                F.length("w") <= L,
                F.concat(F.lit(f"word exceeds max_word_len={L}: "), F.col("w")),
            ).isNull(),
            F.length("w"),
        ),
    )
    best = {0: F.lit(0).cast("long")}
    for i in range(1, L + 1):
        cands = []
        for l in range(1, min(max_piece_len, i) + 1):
            c = F.try_element_at(cost_map, F.substring("w", i - l + 1, l))
            cands.append(
                F.when(c.isNotNull(), best[i - l] + c.cast("long")).otherwise(
                    F.lit(_BIG)
                )
            )
        df = df.withColumn(f"b{i}", F.least(*cands) if len(cands) > 1 else cands[0])
        best[i] = F.col(f"b{i}")
        # backpointer: piece length, ties -> LONGER piece (check l descending)
        back = None
        for l in range(min(max_piece_len, i), 0, -1):
            c = F.try_element_at(cost_map, F.substring("w", i - l + 1, l))
            hit = c.isNotNull() & (best[i - l] + c.cast("long") == F.col(f"b{i}"))
            back = F.when(hit, F.lit(l)) if back is None else back.when(hit, F.lit(l))
        df = df.withColumn(f"k{i}", back)

    total = None
    for i in range(1, L + 1):
        cond = F.col("len") == i, F.col(f"b{i}")
        total = F.when(*cond) if total is None else total.when(*cond)
    df = df.withColumn("cost_q6", total.otherwise(F.lit(0)).cast("long"))

    # backtrace fold: pos starts at len; each step consumes one piece
    back_at = None
    for i in range(1, L + 1):
        cond = F.col("pos") == i, F.col(f"k{i}")
        back_at = F.when(*cond) if back_at is None else back_at.when(*cond)
    df = (
        df.withColumn("pos", F.col("len"))
        .withColumn("seg", F.lit(""))
        .withColumn("np", F.lit(0).cast("long"))
    )
    for _ in range(L):
        k = back_at
        piece = F.substr(F.col("w"), F.col("pos") - k + F.lit(1), k)
        step = F.col("pos") > 0
        df = (
            df.withColumn(
                "seg",
                F.when(
                    step,
                    F.concat(
                        piece,
                        F.when(F.col("seg") == "", F.lit("")).otherwise(F.lit("|")),
                        F.col("seg"),
                    ),
                ).otherwise(F.col("seg")),
            )
            .withColumn("np", F.when(step, F.col("np") + 1).otherwise(F.col("np")))
            .withColumn("pos", F.when(step, F.col("pos") - k).otherwise(F.col("pos")))
        )
    return df.select(
        F.col("w").alias("word"),
        "freq",
        "cost_q6",
        F.col("np").alias("n_pieces"),
        "seg",
    )


def unigram_lm_oracle_sql(
    top_k: int = 12, max_piece_len: int = 4, max_word_len: int = 16, limit: int = 30
) -> str:
    """Unrolled DuckDB CTE chain replaying the exact recurrence (the
    pagerank-chain oracle pattern).  Appended after a prelude defining
    ``tok(doc_id, term, pos)``."""
    P = max_piece_len
    L = max_word_len
    parts = [
        f"""
uwords AS (
  SELECT term AS w, CAST(count(*) AS BIGINT) AS freq
  FROM tok WHERE term <> '' GROUP BY term
),
ucc AS (
  SELECT substr(w, i, 1) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT w, freq, unnest(generate_series(1, length(w))) AS i FROM uwords)
  GROUP BY 1
),
ung AS (
  SELECT substr(w, i, n) AS piece, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (
    SELECT w, freq, n, unnest(generate_series(1, length(w) - n + 1)) AS i
    FROM uwords, (SELECT unnest(generate_series(2, {P})) AS n) ln
    WHERE length(w) >= n
  )
  GROUP BY 1
),
utop AS (SELECT piece, cnt FROM ung ORDER BY cnt DESC, piece ASC LIMIT {top_k}),
uvocab AS (SELECT * FROM ucc UNION ALL SELECT * FROM utop),
utot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM uvocab),
ucost AS (
  SELECT piece, CAST(floor(-ln(cnt / t) * 1000000.0 + 0.5) AS BIGINT) AS c
  FROM uvocab, utot
),
ud0 AS (SELECT w, freq, length(w) AS len FROM uwords)"""
    ]
    big = _BIG
    for i in range(1, L + 1):
        cands = []
        for l in range(1, min(P, i) + 1):
            prev = "CAST(0 AS BIGINT)" if i - l == 0 else f"b{i - l}"
            cands.append(
                f"coalesce({prev} + (SELECT c FROM ucost WHERE piece = "
                f"substr(w, {i - l + 1}, {l})), {big})"
            )
        best = f"least({', '.join(cands)})" if len(cands) > 1 else cands[0]
        backs = []
        for l in range(min(P, i), 0, -1):
            prev = "CAST(0 AS BIGINT)" if i - l == 0 else f"b{i - l}"
            backs.append(
                f"WHEN {prev} + (SELECT c FROM ucost WHERE piece = "
                f"substr(w, {i - l + 1}, {l})) = b{i} THEN {l}"
            )
        parts.append(
            f"ud{i}a AS (SELECT *, {best} AS b{i} FROM ud{i - 1}),\n"
            f"ud{i} AS (SELECT *, CASE {' '.join(backs)} END AS k{i} FROM ud{i}a)"
        )
    cost_case = " ".join(f"WHEN {i} THEN b{i}" for i in range(1, L + 1))
    parts.append(
        f"ut0 AS (SELECT w, freq, len, "
        f"CASE len {cost_case} ELSE 0 END AS cost_q6, "
        f"len AS pos, '' AS seg, CAST(0 AS BIGINT) AS np, "
        + ", ".join(f"k{i}" for i in range(1, L + 1))
        + " FROM ud" + str(L) + ")"
    )
    back_case = "CASE pos " + " ".join(f"WHEN {i} THEN k{i}" for i in range(1, L + 1)) + " END"
    for s in range(1, L + 1):
        parts.append(
            f"""ut{s} AS (
  SELECT w, freq, len, cost_q6,
    CASE WHEN pos > 0 THEN pos - ({back_case}) ELSE pos END AS pos,
    CASE WHEN pos > 0 THEN
      substr(w, pos - ({back_case}) + 1, ({back_case}))
      || (CASE WHEN seg = '' THEN '' ELSE '|' END) || seg
    ELSE seg END AS seg,
    np + (CASE WHEN pos > 0 THEN 1 ELSE 0 END) AS np,
    {", ".join(f"k{i}" for i in range(1, L + 1))}
  FROM ut{s - 1})"""
        )
    parts.append(
        f"""SELECT w AS word, freq, cost_q6, np AS n_pieces, seg
FROM ut{L} ORDER BY freq DESC, word ASC LIMIT {limit}"""
    )
    return ",\n".join(parts[:-1]) + "\n" + parts[-1]
