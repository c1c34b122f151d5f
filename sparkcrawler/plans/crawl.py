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
    # >0 and pages carries an url_bucket partition column → per-round
    # partition pruning of the fetch scan (Iceberg-bucket semantics)
    corpus_buckets: int = 0
    # frontier row count at or below which the round broadcasts the
    # frontier side of the fetch join; above it, a shuffle join runs
    # (against a bucketed corpus table only the frontier side moves)
    broadcast_frontier_limit: int = 2_000_000
    # frontier row count at or below which the frontier's URLs are
    # collected and pushed into the corpus scan as an IN filter →
    # bucket pruning + row-group min/max skipping on url-sorted buckets
    fetch_pushdown_limit: int = 4096
    # skip the Bloom update for small new-URL batches: the filter only
    # pays off when candidate volume is large, and a stale (smaller)
    # bloom is still correct — unseen suspects just take the exact
    # anti-join. Keeps tail rounds from paying a fixed build job.
    bloom_update_min_batch: int = 1


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
        tag(log_df, "processed")  # == frontier rows processed this round
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
    """Lineage rows are a handful of counters — written driver-side with
    pyarrow (a Spark job for ~10 rows costs seconds of scheduling)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pids = sorted(per_partition)
    table = pa.table(
        {
            "run_id": pa.array([run_id] * len(pids), pa.string()),
            "round": pa.array([r] * len(pids), pa.int32()),
            "partition_id": pa.array(pids, pa.int32()),
            "frontier_in": pa.array(
                [per_partition[p].get("processed", 0) for p in pids], pa.int64()
            ),
            "fetched": pa.array(
                [per_partition[p].get("fetched", 0) for p in pids], pa.int64()
            ),
            "deduped": pa.array(
                [
                    max(
                        per_partition[p].get("discovered", 0)
                        - per_partition[p].get("newly_discovered", 0),
                        0,
                    )
                    for p in pids
                ],
                pa.int64(),
            ),
            "newly_discovered": pa.array(
                [per_partition[p].get("newly_discovered", 0) for p in pids],
                pa.int64(),
            ),
        }
    )
    d = _p(out_dir, "lineage", f"r{r}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-0.parquet"))


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
    bloom_covered = next_round  # bloom contains seen rows with round_added <= this
    if cfg.use_bloom:
        bloom = PartitionedBloom(cfg.bloom_shards, cfg.bloom_bits_per_shard)
        bloom.update_from_df(
            _read_tree(spark, _p(out_dir, "seen")).where(
                F.col("round_added") <= F.lit(next_round)
            )
        )

    trace = bool(os.environ.get("SPARKCRAWLER_TRACE"))

    def _tr(label: str, t_start: float) -> None:
        if trace:
            print(f"[round-trace] {label}: {time.time() - t_start:.2f}s",
                  file=__import__('sys').stderr)

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

        t_round = time.time()
        # small frontier → ONE tiny collect powers both prunings:
        # the url IN-list pushed into the corpus scan, and (for a
        # url_bucket-partitioned corpus) the partition-dir set derived
        # driver-side from the same urls via the pure-Python xxh64.
        frontier_buckets = None
        frontier_urls = None
        if frontier_count <= cfg.fetch_pushdown_limit:
            frontier_urls = [
                row[0] for row in frontier.select("url").collect()
            ]
            if cfg.corpus_buckets:
                from sparkcrawler.oracle import url_hash64

                frontier_buckets = sorted(
                    {url_hash64(u) % cfg.corpus_buckets for u in frontier_urls}
                )
            _tr(f"r{r} frontier probe ({len(frontier_urls)} urls)", t_round)
        elif cfg.corpus_buckets and frontier_count < 4 * cfg.corpus_buckets:
            frontier_buckets = [
                row[0]
                for row in frontier.select(
                    F.pmod(F.col("url_hash"), F.lit(cfg.corpus_buckets))
                ).distinct().collect()
            ]
            _tr(f"r{r} bucket probe ({len(frontier_buckets)} buckets)", t_round)
        plan = build_round(
            pages, robots, frontier, run_id, r,
            round_seconds=cfg.round_seconds,
            salt_buckets=cfg.salt_buckets,
            max_admit=max_admit,
            retries=cfg.retries,
            frontier_count=frontier_count,
            frontier_buckets=frontier_buckets,
            frontier_urls=frontier_urls,
            broadcast_frontier_limit=cfg.broadcast_frontier_limit,
        )
        # windows compute once: both the crawl_log job and the
        # next-frontier job read the politeness decision from cache
        plan.decided.persist()
        plan.extracted.persist()
        _tr(f"r{r} plan build", t_round)

        # ---- job 1 (heavy): the round's crawl_log — one UDF execution ----
        par = spark.sparkContext.defaultParallelism
        t1 = time.time()
        # coalesce to the core count: a union of three branches would
        # otherwise emit 100+ tiny files whose later scans cost a task each
        plan.crawl_log.coalesce(par).write.mode("overwrite").parquet(
            _p(out_dir, "crawl_log", f"r{r}")
        )
        _tr(f"r{r} crawl_log write", t1)
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
        discovered = discovered_links(plan.extracted)
        seen_uncovered = (
            seen_all.where(F.col("round_added") > F.lit(bloom_covered))
            if bloom is not None and bloom_covered < r
            else None
        )
        new_links = dedup_against_seen(
            discovered, seen_all, bloom, spark, seen_uncovered
        )
        next_frontier = plan.deferred.withColumn(
            "is_new", F.lit(False)
        ).unionByName(
            new_links.select(*FRONTIER_COLS).withColumn("is_new", F.lit(True))
        )
        t2 = time.time()
        next_frontier.coalesce(par).write.mode("overwrite").parquet(
            _p(out_dir, "frontier", f"r{r + 1}")
        )
        _tr(f"r{r} frontier write", t2)
        fr_next = spark.read.parquet(_p(out_dir, "frontier", f"r{r + 1}"))

        # ---- job 3 (cheap): seen delta from the written frontier ----
        t3 = time.time()
        fr_next.where(F.col("is_new")).select(
            "url_hash", "url", F.col("round").cast("int").alias("round_added")
        ).write.mode("overwrite").parquet(_p(out_dir, "seen", f"r{r + 1}"))
        _tr(f"r{r} seen write", t3)

        # ---- job 4 (cheap): one metrics pass over the committed files ——
        # feeds BOTH the driver's loop decisions and the lineage table.
        t4 = time.time()
        metrics = _collect_metrics(log_df, discovered, fr_next)
        _tr(f"r{r} metrics", t4)
        processed = metrics["totals"].get("processed", 0)
        n_new = metrics["totals"].get("newly_discovered", 0)
        n_deferred = metrics["totals"].get("deferred", 0)

        if cfg.lineage:  # tiny driver-built write
            t6 = time.time()
            _write_lineage_rows(spark, out_dir, run_id, r, metrics["per_partition"])
            _tr(f"r{r} lineage write", t6)

        if bloom is not None and n_new >= cfg.bloom_update_min_batch:
            t5 = time.time()
            # fold in this round's delta AND any previously skipped rounds
            bloom.update_from_df(
                _read_tree(spark, _p(out_dir, "seen")).where(
                    (F.col("round_added") > F.lit(bloom_covered))
                    & (F.col("round_added") <= F.lit(r + 1))
                )
            )
            bloom_covered = r + 1
            _tr(f"r{r} bloom update", t5)

        _commit(out_dir, str(r), {"processed": processed, "new": n_new})
        visited += processed
        stats.append(
            {"round": r, "frontier_in": frontier_count, "processed": processed,
             "new": n_new, "deferred": n_deferred,
             "wall": round(time.time() - t_round, 3)}
        )
        plan.decided.unpersist()
        plan.extracted.unpersist()
        frontier_count = n_new + n_deferred
        _tr(f"r{r} TOTAL", t_round)
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
