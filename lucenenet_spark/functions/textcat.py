"""TextCat language identification (Cavnar & Trenkle 1994, "N-Gram-Based
Text Categorization" — the rank-profile method behind the classic
libtextcat/TextCat identifiers).

Upgrades the engine's stopword-ratio heuristic (`textstats.language_id`)
to the published algorithm: build a character-n-gram RANK profile per
language from labeled training text, build the same profile per
document, and classify by the out-of-place distance

    dist(doc, lang) = sum over the doc's top-N grams of
        |rank_doc(g) - rank_lang(g)|   if g in the language profile
        N                              otherwise (max out-of-place)

All-integer arithmetic with total-order tie-breaks (count desc, gram
asc; distance asc, lang asc), so the result is exact and SQL-oracle
checkable — no float drift anywhere.

Scale design: language profiles are tiny (N grams x L languages) — they
broadcast; the document side is one explode + one map-side-combinable
groupBy + a rank window partitioned by doc (the natural parallel unit);
classification is a broadcast join + one aggregation. No driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_grams(df: DataFrame, text_col: str, key_cols: list[str]) -> DataFrame:
    """(key_cols..., g): word-boundary-padded character 2- and 3-grams
    (Cavnar & Trenkle pad tokens with '_' so affixes rank distinctly).
    Padded words are always >= 3 chars, so sequence bounds stay valid."""
    words = df.select(
        *key_cols,
        F.explode(F.array_remove(F.split(F.col(text_col), " "), "")).alias("w"),
    )
    padded = words.select(
        *key_cols, F.concat(F.lit("_"), F.col("w"), F.lit("_")).alias("pw")
    )
    per_n = [
        F.expr(
            f"transform(sequence(1, length(pw) - {n} + 1),"
            f" i -> substring(pw, i, {n}))"
        )
        for n in (2, 3)
    ]
    return padded.select(
        *key_cols, F.explode(F.flatten(F.array(*per_n))).alias("g")
    )


def _rank_profile(grams: DataFrame, part_col: str, top_n: int) -> DataFrame:
    """(part_col, g, rank): the top-N grams per partition key by count,
    ranked 1..N with (count desc, gram asc) total order."""
    counts = grams.groupBy(part_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(part_col).orderBy(
        F.col("cnt").desc(), F.col("g").asc()
    )
    return (
        counts.select(part_col, "g", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= top_n)
    )


def textcat_classify(
    docs: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top_n: int = 40,
) -> DataFrame:
    """(id_col, lang_pred, dist): each document's nearest language by
    out-of-place distance between its top-``top_n`` n-gram rank profile
    and the per-language profiles trained from ``train``. Distances are
    exact integers; ties break to the lexicographically smallest
    language."""
    # lang_prof is read twice (distinct langs + the broadcast join):
    # persist so the training-gram scan and rank window run once
    lang_prof = _rank_profile(
        _char_grams(train, text_col, [lang_col]), lang_col, top_n
    ).withColumnRenamed("rank", "lr").persist()
    doc_prof = _rank_profile(
        _char_grams(docs, text_col, [id_col]), id_col, top_n
    ).withColumnRenamed("rank", "dr")
    langs = lang_prof.select(lang_col).distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lang_prof), [lang_col, "g"], "left")
        .groupBy(id_col, lang_col)
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("dr") - F.col("lr")), F.lit(top_n)
                )
            ).cast("long").alias("dist")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist").asc(), F.col(lang_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col(lang_col).alias("lang_pred"), "dist")
    )
