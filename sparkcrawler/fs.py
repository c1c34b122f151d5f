"""Driver-side filesystem abstraction for crawl state I/O.

The round loop keeps its metrics/lineage/commit plumbing driver-side
(a columnar read of a round's output is milliseconds where a Spark job
costs seconds of scheduling), but a 100-TB corpus lives on object
storage, not a POSIX disk. Every driver-side touch of the state tables
goes through this shim — an fsspec-shaped surface (``exists`` /
``glob`` / ``makedirs`` / atomic JSON markers / parquet reads+writes)
with a local implementation now. An S3/GCS backend is a drop-in
subclass (fsspec's ``AbstractFileSystem`` exposes the same verbs);
nothing in ``plans/crawl.py`` assumes POSIX semantics beyond
atomic-rename for commit markers, which object stores provide via
put-if-absent or a rename-on-close convention.

Executor-side data movement never comes through here: the heavy reads
and writes are Spark jobs (``spark.read.parquet`` / ``DataFrame.write``)
which speak to object stores natively.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import uuid


class LocalFS:
    """Local-disk backend. All paths are plain strings; ``sep`` is '/'
    on every backend we target (posix, s3, gcs)."""

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def glob(self, pattern: str) -> list[str]:
        return sorted(_glob.glob(pattern))

    # ---- commit markers (tiny JSON, atomic publish) ----

    def write_json_atomic(self, path: str, payload: dict) -> None:
        """fsync + rename: the marker is either absent or complete."""
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def read_json(self, path: str) -> dict:
        with open(path) as fh:
            return json.load(fh)

    def write_text(self, path: str, text: str) -> None:
        with open(path, "w") as fh:
            fh.write(text)

    # ---- driver-side parquet (metrics/lineage scale: KBs per round) ----

    def read_parquet(self, path: str, columns: list[str] | None = None):
        import pyarrow.parquet as pq

        return pq.read_table(path, columns=columns)

    def parquet_num_rows(self, path: str) -> int:
        """Row count from the footer — no column data is read."""
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows

    def parquet_column_names(self, path: str) -> list[str]:
        import pyarrow.parquet as pq

        return list(pq.ParquetFile(path).schema_arrow.names)

    def write_parquet(self, table, dirpath: str, name: str | None = None) -> None:
        import pyarrow.parquet as pq

        self.makedirs(dirpath)
        pq.write_table(
            table, self.join(dirpath, name or f"part-{uuid.uuid4().hex}.parquet")
        )


DEFAULT_FS = LocalFS()
