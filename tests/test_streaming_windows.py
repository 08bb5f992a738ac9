"""Event-time streaming ops: the watermarked windowed aggregation and the
applyInPandasWithState sessionizer, driven through REAL Structured
Streaming queries (file source, availableNow) and compared against the
batch twin plans on the same input."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.streaming.windows import sessionize, windowed_event_counts


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_src"))
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(2000)
        .cache()
    )
    ev.write.mode("overwrite").parquet(src)
    return spark.read.parquet(src), src


def test_windowed_counts_stream_matches_batch(spark, events, tmp_path):
    ev, src = events
    batch = {
        (str(r["window_start"]), r["event_type"]): (r["cnt"], r["value_sum_q"])
        for r in windowed_event_counts(ev, "1 hour").collect()
    }

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = windowed_event_counts(stream, "1 hour", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["cnt"], r["value_sum_q"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == batch
    assert len(got) > 0


def test_sessionize_stream_closes_sessions(spark, events, tmp_path):
    """The stateful sessionizer emits exactly the sessions that CLOSE
    within the stream (a newer event arrived after the gap); each user's
    final open session stays in state. Emitted sessions must byte-match
    the batch gaps-and-islands result."""
    ev, src = events
    batch_rows = sessionize(ev, gap_minutes=30).collect()
    batch = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in batch_rows
    }
    # each user's last (open) session won't emit from the stream
    last_per_user = {}
    for r in batch_rows:
        k = r["user_id"]
        if k not in last_per_user or str(r["session_start"]) > last_per_user[k]:
            last_per_user[k] = str(r["session_start"])
    expected = {
        k: v for k, v in batch.items() if last_per_user[k[0]] != k[1]
    }

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["session_start"])): (str(r["session_end"]), r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_dedup_exact_stream_matches_batch(spark, tmp_path):
    from lucenenet_spark.streaming.windows import dedup_exact_stream

    rows = [(i, f"text {i % 40}") for i in range(200)]  # 5 dups per text
    src = str(tmp_path / "docs_src")
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    # write in doc_id order so the stream's first arrival == smallest id
    docs.orderBy("doc_id").write.mode("overwrite").parquet(src)
    batch = {
        (r["doc_id"], r["text_hash"])
        for r in dedup_exact_stream(spark.read.parquet(src)).collect()
    }
    assert len(batch) == 40

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = dedup_exact_stream(stream).select("doc_id", "text_hash")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["doc_id"], r["text_hash"])
        for r in spark.sql("SELECT * FROM dedup_stream").collect()
    }
    assert got == batch


def test_interval_join_stream_matches_batch(spark, events, tmp_path):
    """Stream-stream interval join (click -> purchase within 5 min per
    user): the watermarked streaming inner join must emit exactly the
    batch plan's pairs."""
    from lucenenet_spark.streaming.windows import interval_join

    ev, src = events
    batch = {
        (r["user_id"], r["l_id"], r["r_id"], r["gap_micros"])
        for r in interval_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            upper_minutes=5,
        ).collect()
    }

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = interval_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        upper_minutes=5,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ivj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["l_id"], r["r_id"], r["gap_micros"])
        for r in spark.sql("SELECT * FROM ivj").collect()
    }
    assert got == batch
    assert len(got) > 0
