"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch twin is ``analytics.events_sessionized`` (lag + gap>30min
flags). Streaming can't use a lag window — session state must live in
the state store across micro-batches: per user we keep (last event ts,
open-session count, event count) and emit one row per user per batch
with the running totals. Draining the whole input with
``Trigger.AvailableNow`` and keeping each user's LAST emitted row must
reproduce the batch sessionization exactly (asserted in tests) —
provided each user's events arrive in timestamp order across batches,
which the single-directory parquet source with one file per chunk and
``maxFilesPerTrigger=1`` guarantees when files are written in ts order.

This is the engine's template for custom stateful crawl-side streams
(e.g. per-host fetch-rate accounting at 10^10 scale): state is keyed,
partition-local, Arrow-batched, and bounded by a processing-time
timeout rather than driver memory.
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
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"].astype("int64") // 1_000_000_000:
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
