"""Round-5 part-zzp twins: frame sampling and media mime stats."""

from __future__ import annotations

from lucenenet_spark.functions.multimodal import media_stats, sample_frames
from pyspark.sql import functions as F


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, payload.encode(), mime, None, None) for i, (payload, mime) in enumerate(rows)],
        "media_id long, payload binary, mime string, width int, height int",
    )


def test_frame_slicing_replica(spark):
    rows = [("a" * 150, "video/fake"), ("b" * 20, "video/fake"), ("c" * 700, "video/fake")]
    m = _media(spark, rows)
    got = {}
    for r in sample_frames(m, every_n_bytes=64, max_frames=8).collect():
        got.setdefault(r["media_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for i, (payload, _) in enumerate(rows):
        b = payload.encode()
        nf = min(8, max(1, len(b) // 64))
        want = {j: b[j * 64 : (j + 1) * 64] for j in range(nf)}
        assert got[i] == want
    # 700 bytes -> 10 full frames capped at 8
    assert len(got[2]) == 8
    # short payload -> a single (partial) frame with the whole payload
    assert got[1] == {0: b"b" * 20}


def test_frame_null_payload_skipped(spark):
    m = spark.createDataFrame(
        [(0, None, "video/fake", None, None), (1, b"x" * 64, "video/fake", None, None)],
        "media_id long, payload binary, mime string, width int, height int",
    )
    rows = sample_frames(m).collect()
    assert {r["media_id"] for r in rows} == {1}


def test_media_stats_replica(spark):
    rows = [("aaaa", "image/fake"), ("bb", "image/fake"), ("cccccc", "audio/fake")]
    got = {r["mime"]: r for r in media_stats(_media(spark, rows)).collect()}
    assert got["image/fake"]["n_items"] == 2 and got["image/fake"]["total_bytes"] == 6
    assert got["audio/fake"]["n_items"] == 1 and got["audio/fake"]["total_bytes"] == 6


def test_frame_plan_is_arrow_batched(spark):
    # the plumbing claim: mapInPandas (Arrow batches), not per-row Python
    m = _media(spark, [("x" * 100, "video/fake")])
    plan = sample_frames(m)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
