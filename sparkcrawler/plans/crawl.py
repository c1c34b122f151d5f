"""Driver loop: BFS crawl rounds with atomic snapshots + resume.

The reference's asyncio producer/consumer event loop (reference
simple_crawler/main.py:36-132) becomes a synchronous driver loop: one
BFS round per iteration, each round committed as an atomic snapshot
(crawl_log / seen / frontier_{r+1} / lineage under ``round=r`` dirs plus
a ``_committed_r`` marker — Iceberg-snapshot semantics without Iceberg,
SURVEY.md §7.3). A killed run resumes from the max committed round and
reproduces the remaining rounds bit-for-bit, because every round's input
is exactly the previously committed parquet.

Stop conditions mirror the reference: cumulative completed pages ≥
max_pages (cache.py:57-59 ``limit_reached``) or an empty frontier (the
25-empty-poll exit, main.py:60-64 — deterministic here: an empty
frontier IS the end).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkcrawler import schemas
from sparkcrawler.functions.urlnorm import canonicalize
from sparkcrawler.operators.seen import PartitionedBloom, dedup_against_seen
from sparkcrawler.plans.round import FRONTIER_COLS, build_round, discovered_links


@dataclass
class CrawlConfig:
    max_pages: int = 10                # reference default MAX_PAGES=10
    retries: int = 1                   # corpus fetches are deterministic
    round_seconds: float = 60.0        # politeness budget window per round
    salt_buckets: int = 16
    max_rounds: int = 1000
    use_bloom: bool = True
    bloom_shards: int = 16
    bloom_bits_per_shard: int = 1 << 22
    lineage: bool = True


@dataclass
class CrawlResult:
    run_id: str
    rounds: int
    visited: int
    out_dir: str
    wall_seconds: float
    round_stats: list[dict] = field(default_factory=list)


def _p(out_dir: str, *parts: str) -> str:
    return os.path.join(out_dir, *parts)


def _marker(out_dir: str, name: str) -> str:
    return _p(out_dir, f"_committed_{name}")


def _commit(out_dir: str, name: str, payload: dict) -> None:
    tmp = _marker(out_dir, name) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, _marker(out_dir, name))


def _max_committed_round(out_dir: str) -> int | None:
    """Highest committed round, or None if not even init committed."""
    if not os.path.exists(_marker(out_dir, "init")):
        return None
    r = -1
    while os.path.exists(_marker(out_dir, str(r + 1))):
        r += 1
    return r


def seed_frontier(spark: SparkSession, seed_urls: list[str]) -> DataFrame:
    """Seeds → canonical round-0 frontier (priority 0 = crawled first)."""
    rows = []
    seen_local = set()
    for u in seed_urls:
        cu = canonicalize(None, u)
        if cu and cu not in seen_local:
            seen_local.add(cu)
            rows.append((cu,))
    df = spark.createDataFrame(rows, "url string")
    return (
        df.withColumn("url_hash", F.xxhash64("url"))
        .withColumn(
            "host", F.coalesce(F.parse_url(F.col("url"), F.lit("HOST")), F.lit(""))
        )
        .withColumn("depth", F.lit(0).cast("int"))
        .withColumn("priority", F.lit(0.0))
        .withColumn("round", F.lit(0).cast("int"))
        .withColumn("attempt", F.lit(0).cast("int"))
        .select(*FRONTIER_COLS)
    )


def _append_run_event(spark, out_dir, run_id, seed_url, max_pages, event):
    row = spark.createDataFrame(
        [(run_id, seed_url, max_pages, event)],
        "run_id string, seed_url string, max_pages int, event string",
    ).withColumn("event_time", F.current_timestamp())
    row.write.mode("append").parquet(_p(out_dir, "runs"))


def _collect_metrics(log_df, discovered, fr_next) -> dict:
    """ONE Spark job computing every per-partition counter the round
    needs (north rule A6) — driver decisions + lineage both feed off it.

    Partition ids are per-stage (each metric's own scan), which is the
    honest granularity for an audit table built from committed files.
    """
    def tag(df, metric):
        return (
            df.select(F.spark_partition_id().alias("partition_id"))
            .groupBy("partition_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(metric).alias("metric"), "partition_id", "n")
        )

    union = (
        tag(log_df, "processed")
        .unionByName(tag(log_df.where(F.col("crawl_status") == schemas.PARSED), "fetched"))
        .unionByName(tag(discovered, "discovered"))
        .unionByName(tag(fr_next.where(F.col("is_new")), "newly_discovered"))
        .unionByName(tag(fr_next.where(~F.col("is_new")), "deferred"))
    )
    totals: dict[str, int] = {}
    per_partition: dict[int, dict[str, int]] = {}
    for row in union.collect():
        totals[row["metric"]] = totals.get(row["metric"], 0) + int(row["n"])
        per_partition.setdefault(int(row["partition_id"]), {})[row["metric"]] = int(row["n"])
    return {"totals": totals, "per_partition": per_partition}


def _write_lineage_rows(spark, out_dir, run_id, r, per_partition: dict) -> None:
    rows = []
    for pid, m in sorted(per_partition.items()):
        rows.append(
            (
                run_id, r, pid,
                m.get("processed", 0),
                m.get("fetched", 0),
                max(m.get("discovered", 0) - m.get("newly_discovered", 0), 0),
                m.get("newly_discovered", 0),
            )
        )
    spark.createDataFrame(rows, schemas.LINEAGE_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(_p(out_dir, "lineage", f"r{r}"))


def crawl(
    spark: SparkSession,
    pages: DataFrame,
    robots: DataFrame,
    seed_urls: list[str],
    out_dir: str,
    run_id: str = "run_0",
    config: CrawlConfig | None = None,
    extra_frontier: DataFrame | None = None,
) -> CrawlResult:
    """Run (or resume) a crawl. All state lives under ``out_dir``.

    ``extra_frontier`` lets the sitemap priming loop inject additional
    round-0 URLs (reference main.py:26-33 prime_queue).
    """
    cfg = config or CrawlConfig()
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)

    resume_round = _max_committed_round(out_dir)
    if resume_round is None:
        # ---- fresh run: commit the seed snapshot ("init") ----
        frontier0 = seed_frontier(spark, seed_urls)
        if extra_frontier is not None:
            frontier0 = (
                frontier0.unionByName(extra_frontier.select(*FRONTIER_COLS))
                .dropDuplicates(["url_hash"])
            )
        frontier0.write.mode("overwrite").parquet(_p(out_dir, "frontier", "r0"))
        seen0 = spark.read.parquet(_p(out_dir, "frontier", "r0")).select(
            "url_hash", "url", F.lit(0).cast("int").alias("round_added")
        )
        seen0.write.mode("overwrite").parquet(_p(out_dir, "seen", "r0"))
        _append_run_event(
            spark, out_dir, run_id,
            seed_urls[0] if seed_urls else None, cfg.max_pages, "start_run",
        )
        _commit(out_dir, "init", {"run_id": run_id})
        next_round = 0
        visited = 0
    else:
        next_round = resume_round + 1
        log_path = _p(out_dir, "crawl_log")
        # count only COMMITTED rounds — a round that died mid-write may
        # have left an uncommitted crawl_log/r{k} behind (it will be
        # overwritten when round k re-runs).
        visited = (
            _read_tree(spark, log_path)
            .where(F.col("round") <= F.lit(resume_round))
            .count()
            if os.path.exists(log_path)
            else 0
        )
        _append_run_event(
            spark, out_dir, run_id, seed_urls[0] if seed_urls else None,
            cfg.max_pages, "resume_run",
        )

    # Bloom filter over everything ever seen (rebuilt on resume from the
    # committed seen table — filters only skip definite-misses).
    bloom = None
    if cfg.use_bloom:
        bloom = PartitionedBloom(cfg.bloom_shards, cfg.bloom_bits_per_shard)
        bloom.update_from_df(
            _read_tree(spark, _p(out_dir, "seen")).where(
                F.col("round_added") <= F.lit(next_round)
            )
        )

    stats: list[dict] = []
    r = next_round
    # frontier size is carried between rounds (deferred + newly discovered)
    # so the loop never spends a count() job on it; on entry (fresh or
    # resume) it is unknown → None means "count it once".
    frontier_count: int | None = None
    while r < cfg.max_rounds and visited < cfg.max_pages:
        frontier_path = _p(out_dir, "frontier", f"r{r}")
        if not os.path.exists(frontier_path):
            break
        frontier = spark.read.parquet(frontier_path)
        if frontier_count is None:
            frontier_count = frontier.count()
        if frontier_count == 0:
            break

        remaining = cfg.max_pages - visited
        max_admit = remaining if frontier_count > remaining else None

        plan = build_round(
            pages, robots, frontier, run_id, r,
            round_seconds=cfg.round_seconds,
            salt_buckets=cfg.salt_buckets,
            max_admit=max_admit,
            retries=cfg.retries,
        )

        # ---- job 1 (heavy): the round's crawl_log — one UDF execution ----
        plan.crawl_log.write.mode("overwrite").parquet(
            _p(out_dir, "crawl_log", f"r{r}")
        )
        log_df = spark.read.parquet(_p(out_dir, "crawl_log", f"r{r}"))

        # ---- job 2: next frontier = politeness-deferred ∪ (discovered ∖ seen)
        # Discovery reads the *committed* log, so the extract UDF never
        # re-runs; an `is_new` tag lets the seen delta be carved out of
        # the written file instead of recomputing the anti-join.
        # only committed seen rows: a torn previous attempt may have left
        # an uncommitted seen/r{r+1} behind; its rows must not dedup away
        # this round's (recomputed) discoveries.
        seen_all = _read_tree(spark, _p(out_dir, "seen")).where(
            F.col("round_added") <= F.lit(r)
        )
        discovered = discovered_links(log_df)
        new_links = dedup_against_seen(discovered, seen_all, bloom, spark)
        next_frontier = plan.deferred.withColumn(
            "is_new", F.lit(False)
        ).unionByName(
            new_links.select(*FRONTIER_COLS).withColumn("is_new", F.lit(True))
        )
        next_frontier.write.mode("overwrite").parquet(
            _p(out_dir, "frontier", f"r{r + 1}")
        )
        fr_next = spark.read.parquet(_p(out_dir, "frontier", f"r{r + 1}"))

        # ---- job 3 (cheap): seen delta from the written frontier ----
        fr_next.where(F.col("is_new")).select(
            "url_hash", "url", F.lit(r + 1).cast("int").alias("round_added")
        ).write.mode("overwrite").parquet(_p(out_dir, "seen", f"r{r + 1}"))

        # ---- job 4 (cheap): one metrics pass over the committed files ——
        # feeds BOTH the driver's loop decisions and the lineage table.
        metrics = _collect_metrics(log_df, discovered, fr_next)
        processed = metrics["totals"].get("processed", 0)
        n_new = metrics["totals"].get("newly_discovered", 0)
        n_deferred = metrics["totals"].get("deferred", 0)

        if cfg.lineage:  # tiny driver-built write
            _write_lineage_rows(spark, out_dir, run_id, r, metrics["per_partition"])

        if bloom is not None and n_new > 0:
            bloom.update_from_df(
                spark.read.parquet(_p(out_dir, "seen", f"r{r + 1}"))
            )

        _commit(out_dir, str(r), {"processed": processed, "new": n_new})
        visited += processed
        stats.append(
            {"round": r, "frontier_in": frontier_count, "processed": processed,
             "new": n_new, "deferred": n_deferred}
        )
        frontier_count = n_new + n_deferred
        r += 1

    _append_run_event(
        spark, out_dir, run_id, seed_urls[0] if seed_urls else None,
        cfg.max_pages, "complete_run",
    )
    return CrawlResult(
        run_id=run_id,
        rounds=r - next_round,
        visited=visited,
        out_dir=out_dir,
        wall_seconds=time.time() - t0,
        round_stats=stats,
    )


def _read_tree(spark: SparkSession, path: str) -> DataFrame:
    """Read all round subdirs (r0, r1, ...) under a state table dir."""
    return spark.read.option("recursiveFileLookup", "true").parquet(path)


def read_crawl_log(spark: SparkSession, out_dir: str) -> DataFrame:
    return _read_tree(spark, _p(out_dir, "crawl_log"))


def read_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    return _read_tree(spark, _p(out_dir, "seen"))


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return _read_tree(spark, _p(out_dir, "lineage"))


def read_runs(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_p(out_dir, "runs"))
