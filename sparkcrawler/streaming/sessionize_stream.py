"""Per-user streaming sessionization — two operators:

1. :func:`sessionize_windows_stream` — the ROBUST, out-of-order-safe
   form: Spark's ``session_window`` + event-time watermark. Events may
   arrive in any order across micro-batches (up to the watermark
   delay); the state store merges/extends windows and append mode
   emits each session exactly once when the watermark passes its
   close. This is the production path — the reference's event loop
   tolerates arbitrary arrival order (reference main.py:51-132), and
   so does this.

2. :func:`sessionize_stream` — the custom-stateful TEMPLATE
   (``applyInPandasWithState``): per user we keep (last event ts,
   session count, event count) and emit running totals in update mode.
   It demonstrates keyed, Arrow-batched, partition-local state — the
   building block for crawl-side streams like per-host fetch-rate
   accounting at 10^10 scale. NOTE: this template assumes each user's
   events arrive in timestamp order ACROSS micro-batches (one
   ts-ordered file per trigger); for out-of-order streams use the
   session_window operator above, or add reorder-buffering to the
   state.

Gap-boundary contract: the stateful template and its batch twin
(``analytics.events_sessionized``) treat a gap of exactly
``SESSION_GAP_SECONDS`` as the SAME session (``>`` rule);
``session_window`` starts a new one (merge requires strictly earlier
than window end). Each operator is verified against its own
same-semantics batch twin.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_GAP_SECONDS = 1800  # == batch twin (events_sessionized)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),      # epoch seconds of last event
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", IntegerType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """One user's new events + persisted state → updated running totals.
    Events inside a batch are sorted by (ts, event_id); the gap rule is
    identical to the batch twin's lag() logic."""
    last_ts, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    # one user's micro-batch may span several Arrow chunks: concatenate
    # BEFORE sorting so the (ts, event_id) order is global to the batch,
    # not per-chunk
    chunks = list(pdfs)
    if chunks:
        batch = pd.concat(chunks, ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        for ts in batch["ts"].astype("int64") // 1_000_000_000:
            ts = int(ts)
            if last_ts is None or ts - last_ts > SESSION_GAP_SECONDS:
                n_sessions += 1
            last_ts = ts
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def sessionize_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_table: str = "stream_sessions",
):
    """availableNow stream: events parquet → stateful per-user session
    counts → memory sink (update mode: one running-total row per user
    per micro-batch; the LAST row per user is the final answer)."""
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
    )
    sessions = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_windows_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_table: str = "stream_session_windows",
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = "1 hour",
):
    """Out-of-order-safe sessionization: ``session_window`` + event-time
    watermark, append mode. Events later than ``watermark`` behind the
    max seen event time are dropped (the documented lateness bound);
    anything within it lands in the right session regardless of file
    arrival order — the state store merges overlapping windows across
    micro-batches. Each finalized session emits exactly once, when the
    watermark passes its close.

    Flush note: with a finite input (availableNow drain) the watermark
    ends at ``max(ts) - watermark``, so sessions newer than that are
    still open at shutdown. Batch-file replays that need every session
    emitted append a terminal flush event far enough in the future
    (tests do exactly this); a live stream simply keeps running.
    """
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_path)
    )
    sessions = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_seconds} seconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_windows_batch(
    spark: SparkSession, events_path: str,
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Batch twin of :func:`sessionize_windows_stream` — identical
    ``session_window`` semantics over the same files."""
    ev = spark.read.parquet(events_path)
    return (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_seconds} seconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def sessionize_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch reference (same semantics as analytics.events_sessionized)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(events_path)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    return (
        ev.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_s").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
