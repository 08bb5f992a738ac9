"""Gate registry round-5 part zzp: multimodal plumbing completions —
frame-sampling explode shape and typed-metadata media stats.  The
corpus text rides as the opaque binary payload (ASCII, so byte slices
== char slices and the SQL oracle can reproduce the md5 of every
frame exactly); the codec stand-in is the documented deterministic
fake (functions/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.plans.gate import gate, get_engine

_FR_EVERY = 64
_FR_MAX = 8


def _media(docs):
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.element_at(
            F.array(F.lit("image/fake"), F.lit("audio/fake"), F.lit("video/fake")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


# ----------------------------------------------------------------------
# media_frame_sample — one row per sampled frame: byte-slice stand-in
# for the video codec, md5-fingerprinted for the hash compare.
# ----------------------------------------------------------------------
_FS_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS nb
  FROM documents
),
fr AS (
  SELECT media_id,
         CAST(unnest(generate_series(0,
           least({_FR_MAX}, greatest(1, nb // {_FR_EVERY})) - 1)) AS INT)
           AS frame_idx,
         text, nb
  FROM m
)
SELECT media_id, frame_idx,
       md5(substr(text, frame_idx * {_FR_EVERY} + 1, {_FR_EVERY})) AS frame_md5,
       CAST(octet_length(encode(substr(text, frame_idx * {_FR_EVERY} + 1,
            {_FR_EVERY}))) AS BIGINT) AS frame_len
FROM fr
"""


@gate("media_frame_sample", _FS_SQL)
def media_frame_sample(spark, sf_dir):
    """sample_frames plumbing: up to 8 64-byte frames per media row via
    Arrow-batched mapInPandas; md5 of each frame's bytes matches the
    oracle's char-slice md5 because the payload is ASCII."""
    from lucenenet_spark.functions.multimodal import sample_frames

    _, _, docs = get_engine(spark, sf_dir)
    frames = sample_frames(_media(docs), every_n_bytes=_FR_EVERY, max_frames=_FR_MAX)
    return frames.select(
        "media_id",
        "frame_idx",
        F.md5(F.col("frame")).alias("frame_md5"),
        F.length(F.col("frame")).cast("long").alias("frame_len"),
    )


# ----------------------------------------------------------------------
# media_mime_stats — per-mime count/bytes, the typed-metadata partition
# dimension of a media table.
# ----------------------------------------------------------------------
_MS_SQL = """
SELECT CASE CAST(doc_id % 3 AS INT)
         WHEN 0 THEN 'image/fake' WHEN 1 THEN 'audio/fake'
         ELSE 'video/fake' END AS mime,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents GROUP BY 1
"""


@gate("media_mime_stats", _MS_SQL)
def media_mime_stats(spark, sf_dir):
    """media_stats over the typed mime column (pure Column aggregation)."""
    from lucenenet_spark.functions.multimodal import media_stats

    _, _, docs = get_engine(spark, sf_dir)
    out = media_stats(_media(docs))
    return out.select(
        "mime",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
    )
