"""Streaming exact dedup (§2.9): duplicates arriving in DIFFERENT
micro-batches are suppressed by watermarked keyed state, and the
drained stream equals the relational dedup twin over the same input."""

from __future__ import annotations

import os
import shutil
import tempfile

from sparkcrawler.streaming.dedup_stream import (
    dedup_events_batch,
    dedup_events_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_dedup_across_microbatches_matches_batch(spark):
    ckpt = tempfile.mkdtemp(prefix="sc_ckpt_dd_")
    events_dir = tempfile.mkdtemp(prefix="sc_events_dd_")
    # stage the SAME file twice: with maxFilesPerTrigger=1 the second
    # copy arrives in a later micro-batch, so suppressing it proves the
    # dedup state persists across micro-batches (not just within one)
    os.symlink(
        f"{SF_DIR}/events.parquet", os.path.join(events_dir, "a.parquet")
    )
    os.symlink(
        f"{SF_DIR}/events.parquet", os.path.join(events_dir, "b.parquet")
    )
    try:
        q = dedup_events_stream(spark, events_dir, ckpt, out_table="t_dd")
        q.awaitTermination(120)
        got = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM t_dd").collect()
        )
        want = sorted(
            tuple(r) for r in dedup_events_batch(spark, events_dir).collect()
        )
        single = sorted(
            tuple(r)
            for r in dedup_events_batch(
                spark, f"{SF_DIR}/events.parquet"
            ).collect()
        )
        assert got and got == want == single
        # and the doubled input really was doubled (dedup did work)
        n_raw = spark.read.parquet(events_dir).count()
        assert n_raw == 2 * len(got)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(events_dir, ignore_errors=True)
