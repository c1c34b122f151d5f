"""Crawl-side stateful stream: per-host running fetch accounting.

The application the stateful-sessionizer template exists for
(COVERAGE.md): a live crawl appends one parquet dir per committed round
(``crawl_log/r{N}``); this stream tails those files and maintains, per
host, the running fetch counts and per-round fetch rate — the
politeness/ops dashboard a 10^10-URL crawl watches continuously, with
state that never leaves the executors (``applyInPandasWithState``:
keyed, Arrow-batched, partition-local).

Every accumulated quantity is COMMUTATIVE (counts, min/max round), so
the result is independent of file arrival order across micro-batches —
unlike the ordered sessionizer template, no reorder buffering is needed
and the stream==batch equivalence holds for any replay order (tested).

Reference analog: the crawl stats the reference's event loop keeps in
Redis counters as it polls (reference simple_crawler/cache.py:57-79,
main.py:91-132), here as an incremental always-on query.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkcrawler import schemas

_STATE_SCHEMA = StructType(
    [
        StructField("n_fetched", LongType()),   # PARSED rows
        StructField("n_rows", LongType()),      # all log rows
        StructField("first_round", IntegerType()),
        StructField("last_round", IntegerType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("n_fetched", LongType()),
        StructField("n_rows", LongType()),
        StructField("first_round", IntegerType()),
        StructField("last_round", IntegerType()),
        StructField("fetch_rate", DoubleType()),  # fetched per active round
    ]
)


def _rate(n_fetched: int, first_round, last_round) -> float:
    span = (last_round - first_round + 1) if first_round is not None else 1
    return round(n_fetched / max(span, 1), 6)


def _host_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n_fetched, n_rows, first_round, last_round = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        if pdf.empty:
            continue
        n_rows += len(pdf)
        n_fetched += int((pdf["crawl_status"] == schemas.PARSED).sum())
        lo = int(pdf["round"].min())
        hi = int(pdf["round"].max())
        first_round = lo if first_round is None else min(first_round, lo)
        last_round = hi if last_round is None else max(last_round, hi)
    state.update((n_fetched, n_rows, first_round, last_round))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_fetched": [n_fetched],
            "n_rows": [n_rows],
            "first_round": [first_round],
            "last_round": [last_round],
            "fetch_rate": [_rate(n_fetched, first_round, last_round)],
        }
    )


def host_rates_stream(
    spark: SparkSession,
    crawl_log_dir: str,
    checkpoint_dir: str,
    out_table: str = "stream_host_rates",
):
    """availableNow stream over a crawl's committed ``crawl_log`` tree
    (one file per trigger → every micro-batch boundary is exercised);
    update-mode running totals, one row per host per batch — the LAST
    row per host is the current answer."""
    stream = (
        spark.readStream.schema(schemas.CRAWL_LOG_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(crawl_log_dir)
    )
    rates = (
        stream.select("host", "round", "crawl_status")
        .groupBy("host")
        .applyInPandasWithState(
            _host_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        rates.writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def host_rates_batch(spark: SparkSession, crawl_log_dir: str) -> DataFrame:
    """Batch twin: identical per-host accounting as one groupBy over the
    same files."""
    log = spark.read.option("recursiveFileLookup", "true").parquet(
        crawl_log_dir
    )
    return (
        log.groupBy("host")
        .agg(
            F.sum(
                F.when(
                    F.col("crawl_status") == schemas.PARSED, F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("long").alias("n_fetched"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("round").cast("int").alias("first_round"),
            F.max("round").cast("int").alias("last_round"),
        )
        .withColumn(
            "fetch_rate",
            F.round(
                F.col("n_fetched")
                / F.greatest(
                    F.col("last_round") - F.col("first_round") + 1, F.lit(1)
                ),
                6,
            ),
        )
    )
