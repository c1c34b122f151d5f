"""Custom stateful streaming (applyInPandasWithState): draining the
per-user sessionizer over chunked, ts-ordered files must reproduce the
batch sessionization exactly."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from sparkcrawler.streaming.sessionize_stream import (
    sessionize_batch,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.01"


def test_stateful_sessionize_matches_batch(spark):
    base = tempfile.mkdtemp(prefix="sc_sess_stream_")
    events_dir = os.path.join(base, "events")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(events_dir)
    try:
        # chunk the events into 4 ts-ordered files: for any user, chunk
        # k's events all precede chunk k+1's (the in-order arrival the
        # operator documents); files get increasing mtimes so the file
        # source lists them in order.
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy(
            "ts", "event_id"
        )
        n = ev.count()
        rows = ev.collect()
        chunk = (n + 3) // 4
        for k in range(4):
            part = rows[k * chunk : (k + 1) * chunk]
            if not part:
                continue
            spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(base, f"stage{k}"))
            src = next(
                f
                for f in os.listdir(os.path.join(base, f"stage{k}"))
                if f.endswith(".parquet")
            )
            shutil.copy(
                os.path.join(base, f"stage{k}", src),
                os.path.join(events_dir, f"chunk-{k}.parquet"),
            )
            time.sleep(0.05)

        q = sessionize_stream(spark, events_dir, ckpt, out_table="sess_t")
        q.awaitTermination(120)

        # update mode emits a running-total row per user per batch; the
        # totals are monotonic, so max() per user is the final state
        got = {
            r["user_id"]: (r["ns"], r["ne"])
            for r in spark.table("sess_t")
            .groupBy("user_id")
            .agg(F.max("n_sessions").alias("ns"), F.max("n_events").alias("ne"))
            .collect()
        }
        want = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in sessionize_batch(spark, events_dir).collect()
        }
        assert got == want
        assert sum(ne for _, ne in got.values()) == n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_session_windows_out_of_order_files_match_batch(spark):
    """The session_window + watermark operator must produce the exact
    batch session set even when files arrive in SHUFFLED ts order —
    the out-of-order robustness the stateful template lacks."""
    import datetime as dt

    base = tempfile.mkdtemp(prefix="sc_sess_win_")
    events_dir = os.path.join(base, "events")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(events_dir)
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").orderBy(
            "ts", "event_id"
        )
        rows = ev.collect()
        n = len(rows)
        tmin, tmax = rows[0]["ts"], rows[-1]["ts"]
        span = (tmax - tmin).total_seconds()
        delay = int(span + 3600)  # nothing is ever later than this bound

        n_chunks = 6
        chunk = (n + n_chunks - 1) // n_chunks
        arrival = [3, 0, 5, 1, 4, 2]  # scrambled ts order
        for pos, k in enumerate(arrival):
            part = rows[k * chunk : (k + 1) * chunk]
            if not part:
                continue
            spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(base, f"stage{k}"))
            src = next(
                f
                for f in os.listdir(os.path.join(base, f"stage{k}"))
                if f.endswith(".parquet")
            )
            shutil.copy(
                os.path.join(base, f"stage{k}", src),
                os.path.join(events_dir, f"chunk-{pos}.parquet"),
            )
            time.sleep(0.05)
        # terminal flush event (sentinel user): pushes the final
        # watermark past every real session's close so append mode
        # emits them all during the availableNow drain
        flush_ts = tmax + dt.timedelta(seconds=delay + 1800 + 7200)
        sentinel = rows[0].asDict()
        sentinel.update({"user_id": -1, "ts": flush_ts})
        spark.createDataFrame([sentinel], ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, "stage_flush"))
        src = next(
            f
            for f in os.listdir(os.path.join(base, "stage_flush"))
            if f.endswith(".parquet")
        )
        shutil.copy(
            os.path.join(base, "stage_flush", src),
            os.path.join(events_dir, "zz-flush.parquet"),
        )

        from sparkcrawler.streaming.sessionize_stream import (
            sessionize_windows_batch,
            sessionize_windows_stream,
        )

        q = sessionize_windows_stream(
            spark, events_dir, ckpt, out_table="sess_win_t",
            watermark=f"{delay} seconds",
        )
        q.awaitTermination(180)

        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.table("sess_win_t").collect()
            if r["user_id"] != -1
        }
        want = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in sessionize_windows_batch(spark, events_dir).collect()
            if r["user_id"] != -1
        }
        assert got == want
        assert sum(t[3] for t in got) == n
    finally:
        shutil.rmtree(base, ignore_errors=True)
