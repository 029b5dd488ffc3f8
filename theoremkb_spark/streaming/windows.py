"""Event-time streaming operators: watermarked window aggregation, a
custom stateful sessionizer (``applyInPandasWithState``), and
watermark-bounded deduplication.

The reference is batch-only, but a Common-Crawl-style event feed is the
canonical late-data workload, so the engine ships the idiomatic
Structured-Streaming shapes on top of the same file-wave ingestion used
by streaming/ingest.py:

* ``windowed_event_counts`` — tumbling event-time windows with a
  watermark: late rows whose window closed are dropped, closed windows
  are emitted exactly once (append mode), open windows are withheld.
* ``sessionize_users`` — per-user sessionization with an inactivity gap
  as an ``applyInPandasWithState`` stateful operator (event-time
  timeout): a session closes when a later event exceeds the gap or when
  the watermark passes its timeout, never twice.
* ``dedup_events`` — at-least-once delivery → exactly-once output via
  ``dropDuplicates`` keyed on (event_id, event time); the watermark
  bounds the dedup state to the delay horizon.

Both run ``Trigger.AvailableNow`` to completion and return the emitted
rows as a batch DataFrame, so the same entrypoints serve tests, the
driver contract, and a continuous deployment (swap the trigger).
Timestamps ride as epoch seconds and are cast to TimestampType only for
the watermark/window machinery — instant-based end to end, so results
do not depend on the session time zone.

Exact emission semantics (pinned empirically, mirrored by the
sequential twins in corpus/stream_oracle.py): a window/state row is
dropped or finalized only when the watermark STRICTLY exceeds its end;
watermark(batch b) = max event time over batches < b minus the delay;
AvailableNow runs a final no-data micro-batch that flushes everything
the final watermark closed.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts_s long, user_id long, event_type string, value double"
)


def _event_stream(
    spark: SparkSession, input_dir: str, files_per_trigger: int | None
) -> DataFrame:
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(files_per_trigger))
    return reader.parquet(input_dir).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )


def _run_to_memory(agg: DataFrame, checkpoint_dir: str) -> DataFrame:
    spark = agg.sparkSession
    sink = f"stream_sink_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window_s: int = 3600,
    delay_s: int = 7201,
    files_per_trigger: int | None = 1,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a ``delay_s``
    watermark; returns the emitted (closed) windows as
    (win_start, win_end, event_type, n_events, sum_value)."""
    src = _event_stream(spark, input_dir, files_per_trigger)
    agg = (
        src.withWatermark("ts", f"{delay_s} seconds")
        .groupBy(F.window("ts", f"{window_s} seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    out = _run_to_memory(agg, checkpoint_dir)
    return out.select(
        F.col("w.start").cast("long").alias("win_start"),
        F.col("w.end").cast("long").alias("win_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def dedup_events(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    delay_s: int = 7201,
    files_per_trigger: int | None = 1,
) -> DataFrame:
    """Watermark-bounded exactly-once event deduplication: an
    at-least-once feed (replayed deliveries) becomes exactly-once
    output via ``dropDuplicates`` keyed on (event_id, event time) under
    a watermark. The event-time column in the dedup key is what BOUNDS
    the state — the watermark evicts keys older than ``delay_s``, so
    state is O(events per watermark horizon), not O(stream history):
    the difference between a pipeline that runs for a day and one that
    runs for a year."""
    src = _event_stream(spark, input_dir, files_per_trigger)
    deduped = src.withWatermark("ts", f"{delay_s} seconds").dropDuplicates(
        ["event_id", "ts"]
    )
    out = _run_to_memory(deduped, checkpoint_dir)
    return out.select("event_id", "ts_s", "user_id", "event_type", "value")


_SESSION_OUT_SCHEMA = "user_id long, session_start long, session_end long, n_events long"
_SESSION_STATE_SCHEMA = "start_s long, last_s long, n long, timeout_ms long"


def sessionize_users(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap_s: int = 1807,
    delay_s: int = 7201,
    files_per_trigger: int | None = 1,
) -> DataFrame:
    """Per-user inactivity-gap sessionization as a custom stateful
    operator (``applyInPandasWithState`` + event-time timeout): emits
    (user_id, session_start, session_end, n_events) once per closed
    session — closed by a successor event farther than ``gap_s`` away,
    or by the watermark passing the session's timeout."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_s * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        cols = ["user_id", "session_start", "session_end", "n_events"]
        if state.hasTimedOut:
            start, last, n, _to = state.get
            state.remove()
            yield pd.DataFrame([(user, start, last, n)], columns=cols)
            return
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            start, last, n, prev_to = state.get
        else:
            start = last = prev_to = None
            n = 0
        # event-time late filter done explicitly (idempotent if the
        # engine already filtered): rows at/below the watermark are gone
        ts_vals = sorted(
            int(t)
            for pdf in pdfs
            for t in pdf["ts_s"]
            if int(t) * 1000 > wm_ms
        )
        closed = []
        for t in ts_vals:
            if start is None:
                start = last = t
                n = 1
            elif t - last > gap_s:
                closed.append((user, start, last, n))
                start = last = t
                n = 1
            else:
                last = max(last, t)
                n += 1
        if start is not None:
            # survivors (or untouched prior state): keep the session
            # alive; the timeout may never move below a prior setting
            to = max(last * 1000 + gap_ms, wm_ms + 1)
            if not ts_vals and prev_to is not None:
                to = max(prev_to, wm_ms + 1)
            state.update((start, last, n, to))
            state.setTimeoutTimestamp(to)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    src = _event_stream(spark, input_dir, files_per_trigger)
    sessions = (
        src.withWatermark("ts", f"{delay_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            _SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return _run_to_memory(sessions, checkpoint_dir)
