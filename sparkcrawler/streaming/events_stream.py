"""Watermarked event-time windowing over a streamed events table.

The reference has no event-time semantics (SURVEY.md §2.9) — this is
the Spark-native upgrade path for its poll-loop: ``readStream`` over
the append-only events directory, 1-hour tumbling windows with a
15-minute watermark for late data, micro-batched via ``foreachBatch``
or drained deterministically with ``Trigger.AvailableNow``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_table: str = "stream_event_counts",
    window: str = "1 hour",
    watermark: str = "15 minutes",
):
    """Start an availableNow stream: events parquet → watermarked
    tumbling-window counts → in-memory sink named ``out_table``.

    Returns the StreamingQuery (caller awaits termination).
    """
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_path)
    )
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts_batch(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch reference for the stream above (same plan, no watermark)."""
    return (
        spark.read.parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
