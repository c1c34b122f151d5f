"""Crawl-side stateful stream (per-host fetch-rate accounting): the
drained stream's final per-host rows must equal the batch groupBy twin
over the same committed crawl_log files — for any file replay order
(all accumulators are commutative)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from sparkcrawler.streaming.host_rates_stream import (
    host_rates_batch,
    host_rates_stream,
)


@pytest.fixture(scope="module")
def crawl_out(spark):
    """A real multi-host crawl (3 hosts incl. the robots/crawl_delay
    mega-host) whose committed crawl_log tree feeds the stream."""
    from sparkcrawler.plans.crawl import CrawlConfig, crawl
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 150, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    out = tempfile.mkdtemp(prefix="sc_hostrates_")
    crawl(
        spark, pages, rob,
        [page_url(h, 0) for h in range(3)],
        out, config=CrawlConfig(max_pages=10_000),
    )
    yield out
    pages.unpersist()
    shutil.rmtree(out, ignore_errors=True)


def _final_rows(spark, table):
    """Update-mode memory sink: keep each host's LAST emitted row."""
    pdf = spark.sql(f"SELECT * FROM {table}").toPandas()
    assert len(pdf) > 0
    return {
        r["host"]: (
            int(r["n_fetched"]), int(r["n_rows"]),
            int(r["first_round"]), int(r["last_round"]),
            float(r["fetch_rate"]),
        )
        for _, r in pdf.iterrows()  # later rows overwrite earlier ones
    }


def test_stream_matches_batch_twin(spark, crawl_out):
    ckpt = tempfile.mkdtemp(prefix="sc_hostrates_ckpt_")
    try:
        q = host_rates_stream(
            spark, f"{crawl_out}/crawl_log", ckpt, out_table="hr_t1"
        )
        q.awaitTermination(180)
        got = _final_rows(spark, "hr_t1")
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    want = {
        r["host"]: (
            int(r["n_fetched"]), int(r["n_rows"]),
            int(r["first_round"]), int(r["last_round"]),
            float(r["fetch_rate"]),
        )
        for r in host_rates_batch(spark, f"{crawl_out}/crawl_log").collect()
    }
    assert got == want
    assert len(want) >= 2  # several hosts actually crawled
    # the mega-host fetched across multiple rounds → a real rate, and
    # fetched counts only PARSED rows (disallowed/404 excluded)
    assert any(v[3] > v[2] for v in want.values())
    assert all(v[0] <= v[1] for v in want.values())


def test_stream_is_order_independent(spark, crawl_out):
    """Replaying the SAME files with a shuffled arrival order (symlinked
    flat dir, reversed lexical order) yields identical final rows."""
    import os

    flat = tempfile.mkdtemp(prefix="sc_hostrates_flat_")
    ckpt = tempfile.mkdtemp(prefix="sc_hostrates_ckpt2_")
    try:
        files = []
        for root, _dirs, names in os.walk(f"{crawl_out}/crawl_log"):
            files += [
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            ]
        # reversed round order via link names
        for i, f in enumerate(sorted(files, reverse=True)):
            os.symlink(f, os.path.join(flat, f"f{i:04d}.parquet"))
        q = host_rates_stream(spark, flat, ckpt, out_table="hr_t2")
        q.awaitTermination(180)
        got = _final_rows(spark, "hr_t2")
    finally:
        shutil.rmtree(flat, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    want = {
        r["host"]: (
            int(r["n_fetched"]), int(r["n_rows"]),
            int(r["first_round"]), int(r["last_round"]),
            float(r["fetch_rate"]),
        )
        for r in host_rates_batch(spark, f"{crawl_out}/crawl_log").collect()
    }
    assert got == want
