"""Structured Streaming surface (§2.9) + insert-or-update (S9) + sitemap
index grouping (A5) + bounded fetch retries (O3)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from sparkcrawler.operators.upsert import upsert
from sparkcrawler.streaming.events_stream import (
    windowed_event_counts_batch,
    windowed_event_counts_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark):
    """availableNow drain of the events stream == the batch plan."""
    import os

    ckpt = tempfile.mkdtemp(prefix="sc_ckpt_")
    # FileStreamSource needs a DIRECTORY of files (an append-only ingest
    # dir); stage the single testdata file into one.
    events_dir = tempfile.mkdtemp(prefix="sc_events_")
    os.symlink(
        f"{SF_DIR}/events.parquet", os.path.join(events_dir, "part-0.parquet")
    )
    try:
        q = windowed_event_counts_stream(
            spark, events_dir, ckpt, out_table="t_stream"
        )
        q.awaitTermination(120)
        got = {
            tuple(r) for r in spark.sql("SELECT * FROM t_stream").collect()
        }
        want = {
            tuple(r)
            for r in windowed_event_counts_batch(
                spark, f"{SF_DIR}/events.parquet"
            ).collect()
        }
        assert got == want and got
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(events_dir, ignore_errors=True)


def test_upsert_semantics(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k int, v string, ver int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 5)], "k int, v string, ver int"
    )
    got = {
        (r["k"], r["v"], r["ver"])
        for r in upsert(existing, updates, ["k"], "ver").collect()
    }
    assert got == {(1, "a", 10), (2, "B", 20), (3, "c", 10), (4, "d", 5)}


def test_upsert_update_wins_version_tie(spark):
    existing = spark.createDataFrame([(1, "old", 10)], "k int, v string, ver int")
    updates = spark.createDataFrame([(1, "new", 10)], "k int, v string, ver int")
    rows = upsert(existing, updates, ["k"], "ver").collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"


def test_sitemap_index_edges(spark):
    from sparkcrawler.plans.sitemap import prime_from_sitemap, sitemap_index_edges
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 80, 4)
    _, details = prime_from_sitemap(
        spark, pages, robots_df(spark, layout), page_url(0, 0), "run_e"
    )
    edges = sitemap_index_edges(details).collect()
    assert len(edges) == 1
    assert edges[0]["index_url"] == "https://host0.example/sitemap-index.xml"
    assert edges[0]["n_children"] == 2


def test_retry_rounds(spark):
    """O3: a missing URL is retried `retries` times across rounds, then
    closed ERROR/404 exactly once."""
    from sparkcrawler.plans.crawl import CrawlConfig, crawl, read_crawl_log
    from sparkcrawler.sources.synth import robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 40, 4)
    out = tempfile.mkdtemp(prefix="sc_retry_")
    try:
        res = crawl(
            spark, pages, robots_df(spark, layout),
            ["https://host1.example/p/424242"], out,
            config=CrawlConfig(max_pages=10, retries=3),
        )
        log = read_crawl_log(spark, out).collect()
        assert len(log) == 1
        assert log[0]["crawl_status"] == -2 and log[0]["status_code"] == 404
        # closed in round 2 (attempts 0,1 deferred; attempt 2 is final)
        assert log[0]["round"] == 2
        assert res.rounds == 3
    finally:
        shutil.rmtree(out, ignore_errors=True)
