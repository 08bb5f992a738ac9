"""Event-time streaming operators over the events stream — the Structured
Streaming surface the reference lacks (Lucene 4.8 is batch+NRT only;
SURVEY.md §2.8) but a web-scale ingestion pipeline needs: watermarked
tumbling/sliding window aggregation with late-data handling, and a custom
stateful sessionizer via applyInPandasWithState.

All functions accept either a STREAMING DataFrame (spark.readStream...) or a
batch DataFrame with the same schema — the plans are identical; batch mode is
how the DuckDB gate checks the aggregation logic (a tumbling window over a
static table is a plain date_trunc groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, event_type, cnt, value_sum_q): tumbling
    (or sliding, if `slide`) event-time window counts.

    Streaming semantics: the watermark bounds state — rows later than
    `watermark` behind the max seen event time are dropped and windows
    older than that are finalized + evicted (late-data contract).
    """
    df = events
    if df.isStreaming:
        # watermarks require TIMESTAMP (not NTZ); the cast preserves the
        # wall-clock reading in the session timezone, so stream and batch
        # windows align
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.floor(F.sum("value") * F.lit(100.0) + F.lit(0.5)).cast("long").alias("value_sum_q"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "value_sum_q",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events): sessions split when
    the gap between consecutive events of a user exceeds `gap_minutes`.

    Streaming shape: applyInPandasWithState keyed by user with a timeout =
    gap (the custom stateful operator of the brief). Batch shape (used by
    the gate): the classic gaps-and-islands window plan — lag() -> new
    session flag -> running sum as session id -> aggregate. Both produce
    identical sessions for the same input.
    """
    from pyspark.sql import Window

    if events.isStreaming:
        return _sessionize_streaming(events, gap_minutes, ts_col, user_col)
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # ts may be TIMESTAMP_NTZ (no long cast): compare the lag as an interval
    gap = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
    marked = events.select(
        user_col,
        F.col(ts_col),
        F.when(
            gap.isNull() | (gap > F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")), 1
        ).otherwise(0).alias("new_s"),
    )
    sess = marked.withColumn("session_no", F.sum("new_s").over(w))
    return (
        sess.groupBy(user_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_no")
    )


def _sessionize_streaming(
    events: DataFrame, gap_minutes: int, ts_col: str, user_col: str
) -> DataFrame:
    """applyInPandasWithState sessionizer: per-user state = (open session
    start, last event time, count); a session closes when the processing
    gap exceeds gap_minutes (GroupStateTimeout.ProcessingTimeTimeout)."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(user_col, T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start", T.TimestampType()),
            T.StructField("last", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        gap = _dt.timedelta(minutes=gap_minutes)
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {user_col: [key[0]], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return
        rows = pd.concat(list(pdf_iter)).sort_values(ts_col)
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in rows[ts_col]:
            if last is not None and (t - last) > gap:
                closed.append((start, last, n))
                start, n = t, 0
            if start is None:
                start = t
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [key[0]] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.ProcessingTimeTimeout
    )


def dedup_exact_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first document per content hash survives.

    Streaming mode: `dropDuplicates` on the md5 content digest — Spark
    keeps the FIRST arrival and maintains one state row per distinct
    hash; with `ts_col` a watermark bounds that state
    (dropDuplicatesWithinWatermark semantics: duplicates later than the
    watermark window may re-emit — the standard at-scale trade).

    Batch twin: deterministic representative (smallest `id_col`) per
    hash — equals the stream's first-arrival when the source replays in
    id order, which is what the stream-vs-batch test pins.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(text_col).cast("binary"))
    if docs.isStreaming:
        df = docs.withColumn("text_hash", h)
        if ts_col is not None:
            df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            df = df.withWatermark(ts_col, watermark)
            return df.dropDuplicatesWithinWatermark(["text_hash"])
        return df.dropDuplicates(["text_hash"])
    w = Window.partitionBy("text_hash").orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("text_hash", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    upper_minutes: int = 5,
    watermark: str = "10 minutes",
) -> DataFrame:
    """(key_col, l_id, r_id, gap_micros): event-time interval join —
    each left event pairs with same-key right events whose timestamp
    lies in (left.ts, left.ts + upper_minutes] (the click->conversion
    attribution shape).

    Streaming semantics: a stream-stream INNER join. Both sides are
    watermarked and the closed time-range predicate lets Spark bound
    the join state — buffered rows older than watermark + interval are
    evicted, so state is O(events per interval), not O(stream). Inner
    matches emit immediately (no watermark wait). Batch mode (used by
    the DuckDB gate) is the identical plan on static frames.
    """
    l = left.select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.select(
        F.col(key_col).alias("rk"),
        F.col(id_col).alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    )
    if left.isStreaming:
        l = l.withColumn("l_ts", F.col("l_ts").cast("timestamp")).withWatermark(
            "l_ts", watermark
        )
        r = r.withColumn("r_ts", F.col("r_ts").cast("timestamp")).withWatermark(
            "r_ts", watermark
        )
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {int(upper_minutes)} MINUTES")
        )
    )
    return (
        l.join(r, cond, "inner")
        .select(
            F.col("k").alias(key_col),
            "l_id",
            "r_id",
            (
                F.unix_micros(F.col("r_ts").cast("timestamp"))
                - F.unix_micros(F.col("l_ts").cast("timestamp"))
            ).alias("gap_micros"),
        )
    )
