"""Gate registry round-5 part zzt: training-prep exports — FIM
prefix/middle/suffix splits and the power-of-two sequence-length
histogram.
"""

from __future__ import annotations

from lucenenet_spark.plans.gate import SQL_PRELUDE, gate, get_engine

_FIM_MIN = 30

_FIM_SQL = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) // 3 AS BIGINT) AS p1,
       CAST(length(text) * 2 // 3 AS BIGINT) AS p2,
       md5(substr(text, 1, length(text) // 3)) AS prefix_md5,
       md5(substr(text, length(text) // 3 + 1,
                  length(text) * 2 // 3 - length(text) // 3)) AS middle_md5,
       md5(substr(text, length(text) * 2 // 3 + 1,
                  length(text) - length(text) * 2 // 3)) AS suffix_md5
FROM documents WHERE length(text) >= {_FIM_MIN}
"""


@gate("fim_split_export", _FIM_SQL)
def fim_split_export(spark, sf_dir):
    """Deterministic FIM thirds with md5-fingerprinted parts."""
    from lucenenet_spark.functions.packing import fim_split_export as _fim

    _, _, docs = get_engine(spark, sf_dir)
    return _fim(docs, min_chars=_FIM_MIN)


# ----------------------------------------------------------------------
# seq_length_histogram — token-length power-of-two buckets.
# ----------------------------------------------------------------------
_SL_SQL = SQL_PRELUDE + """,
dld AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id)
SELECT CAST(CASE WHEN dl <= 1 THEN 1
            ELSE CAST(pow(2, ceil(log2(CAST(dl AS DOUBLE)))) AS BIGINT)
            END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dl) AS BIGINT) AS total_tokens
FROM dld GROUP BY 1
"""


@gate("seq_length_histogram", _SL_SQL)
def seq_length_histogram(spark, sf_dir):
    """Context-window planning: docs and tokens per 2^k length bucket."""
    from lucenenet_spark.functions.packing import seq_length_histogram as _sl

    idx, _, _ = get_engine(spark, sf_dir)
    return _sl(idx)
