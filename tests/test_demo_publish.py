"""The demo/ANN publishers must build their tmp dirs on the DESTINATION
filesystem (``analytics._DEMO_ROOT``), never under ``tempfile.tempdir``:
with a cross-device TMPDIR the publish ``os.rename`` raises EXDEV, and a
publisher that both built under TMPDIR and swallowed the OSError would
silently discard the freshly built artifact and return a nonexistent
path. Pin (a) TMPDIR is ignored and (b) a failed rename that did NOT
lose a race re-raises instead of being swallowed."""

from __future__ import annotations

import os
import tempfile

import sparkcrawler.analytics as A


def test_outdeg_publisher_ignores_tmpdir(monkeypatch, tmp_path):
    fake_tmp = tmp_path / "cross_device_tmp"
    fake_tmp.mkdir()
    monkeypatch.setattr(tempfile, "tempdir", str(fake_tmp))
    monkeypatch.setattr(
        A, "_OUTDEG_DIR", f"{A._DEMO_ROOT}/outdeg_test_exdev"
    )
    try:
        out = A._outdegree_expected_dir()
        assert os.path.exists(os.path.join(out, "_READY"))
        # nothing was ever created under the patched TMPDIR
        assert list(fake_tmp.iterdir()) == []
    finally:
        import shutil

        shutil.rmtree(f"{A._DEMO_ROOT}/outdeg_test_exdev", ignore_errors=True)


def test_demo_crawl_publisher_ignores_tmpdir(spark, monkeypatch, tmp_path):
    fake_tmp = tmp_path / "cross_device_tmp"
    fake_tmp.mkdir()
    monkeypatch.setattr(tempfile, "tempdir", str(fake_tmp))
    base = f"{A._DEMO_ROOT}/crawl_test_exdev"
    monkeypatch.setattr(A, "DEMO_DIR", base)
    monkeypatch.setattr(A, "_DEMO_CRAWL", f"{base}/crawl")
    monkeypatch.setattr(A, "_DEMO_CORPUS", f"{base}/corpus")
    try:
        out = A._demo_crawl_dir(spark)
        assert os.path.exists(os.path.join(base, "_READY"))
        assert os.path.isdir(out)
        assert list(fake_tmp.iterdir()) == []
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


def test_failed_publish_rename_reraises(monkeypatch):
    """A rename that fails when nobody else won the race must surface
    the real error, not be misread as 'lost the race'."""
    import pytest

    monkeypatch.setattr(
        A, "_OUTDEG_DIR", f"{A._DEMO_ROOT}/outdeg_test_exdev2"
    )
    real_rename = os.rename

    def exdev_rename(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(os, "rename", exdev_rename)
    try:
        with pytest.raises(OSError, match="cross-device"):
            A._outdegree_expected_dir()
    finally:
        monkeypatch.setattr(os, "rename", real_rename)
        import shutil

        shutil.rmtree(f"{A._DEMO_ROOT}/outdeg_test_exdev2", ignore_errors=True)
