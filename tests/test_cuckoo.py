"""Per-host cuckoo filters (operators/cuckoo.py): filter invariants
(no false negatives, deletion, resize), the HotHostSeenFilter
composition contract, and crawl-level equivalence."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from sparkcrawler.operators.cuckoo import (
    CuckooFilter,
    HotHostSeenFilter,
    _fingerprints,
)


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(-(2 ** 62), 2 ** 62, size=n).astype(np.int64)


def test_no_false_negatives_and_low_fp():
    hs = _hashes(20_000)
    f = CuckooFilter.from_hashes(hs)
    assert f.contains_many(hs).all()  # every inserted key found
    other = _hashes(20_000, seed=99)
    fresh = other[~np.isin(other, hs)]
    fp_rate = f.contains_many(fresh).mean()
    assert fp_rate < 0.01, fp_rate  # 16-bit fingerprints → ~2^-11 max


def test_delete_removes_exactly_one_copy():
    f = CuckooFilter(64)
    h = 123456789
    assert f.insert(h) and f.insert(h)  # two copies (multiset semantics)
    assert f.count == 2
    assert f.delete(h)
    assert f.contains(h)  # one copy remains
    assert f.delete(h)
    assert not f.contains(h)
    assert not f.delete(h)  # nothing left to delete
    assert f.count == 0


def test_alt_bucket_is_involutive():
    f = CuckooFilter(1 << 10)
    hs = _hashes(1000)
    fps = _fingerprints(hs)
    i1s = f._i1(hs)
    for i1, fp in zip(i1s.tolist()[:200], fps.tolist()[:200]):
        i2 = f._alt(i1, fp)
        assert f._alt(i2, fp) == i1


def test_insert_fails_when_full_and_from_hashes_resizes():
    tiny = CuckooFilter(16)  # 64 slots
    ok = tiny.insert_many(_hashes(200))
    assert not ok  # must report saturation, not drop keys silently
    f = CuckooFilter.from_hashes(_hashes(200))
    assert f.contains_many(_hashes(200)).all()
    assert f.n_buckets >= 64


def test_vectorized_contains_matches_scalar():
    hs = _hashes(500)
    f = CuckooFilter.from_hashes(hs[:250])
    vec = f.contains_many(hs)
    for h, v in list(zip(hs.tolist(), vec.tolist()))[:100]:
        assert f.contains(int(h)) == v


def test_hot_host_filter_overrides_bloom(spark):
    """Composition contract: hot hosts answer from their cuckoo filter
    (complete → miss = definite miss), cold hosts from the Bloom."""
    from pyspark.sql import functions as F

    from sparkcrawler.operators.seen import PartitionedBloom

    seen_hot = _hashes(500, seed=1)
    bloom = PartitionedBloom(4, 1 << 16)
    bloom.add_hashes(seen_hot)  # bloom holds hot-host rows too
    cuckoo = CuckooFilter.from_hashes(seen_hot)
    hot = HotHostSeenFilter(bloom, {"hot.example": cuckoo})

    rows = (
        [("hot.example", int(h)) for h in seen_hot[:50]]          # seen
        + [("hot.example", int(h)) for h in _hashes(50, seed=2)]  # unseen
        + [("cold.example", int(h)) for h in seen_hot[:50]]       # bloom-hit
    )
    df = spark.createDataFrame(rows, "host string, url_hash long")
    got = {
        (r["host"], r["url_hash"]): r["_maybe"]
        for r in hot.tag_maybe(df, spark).collect()
    }
    for h in seen_hot[:50]:
        assert got[("hot.example", int(h))] is True
        assert got[("cold.example", int(h))] is True  # bloom says maybe
    unseen_maybe = [got[("hot.example", int(h))] for h in _hashes(50, seed=2)]
    assert sum(unseen_maybe) <= 1  # near-exact: ~2^-13 FP, no bloom noise


def test_crawl_with_hot_host_filters_identical(spark):
    """End-to-end: hot_hosts=2 must reproduce the plain-bloom crawl
    bit-for-bit (filters only skip definite misses)."""
    from pyspark.sql import functions as F  # noqa: F401

    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    logs, seens = [], []
    try:
        for cfg in (
            CrawlConfig(max_pages=10_000),
            CrawlConfig(max_pages=10_000, hot_hosts=2, hot_host_min_new=4),
        ):
            out = tempfile.mkdtemp(prefix="sc_cuckoo_crawl_")
            try:
                crawl(spark, pages, rob, [seed], out, config=cfg)
                logs.append(
                    sorted(
                        (r["url"], r["depth"], r["crawl_status"], r["status_code"])
                        for r in read_crawl_log(spark, out).collect()
                    )
                )
                seens.append(
                    {r["url"] for r in read_seen(spark, out).collect()}
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)
    finally:
        pages.unpersist()
    assert logs[0] == logs[1]
    assert seens[0] == seens[1]
    assert len(logs[0]) > 40  # a real crawl, not a trivial one


def test_hot_host_crawl_resume_bit_identical(spark):
    """Kill after 2 rounds with hot-host filters active, resume →
    identical to the uninterrupted hot-host run: the hot tally resumes
    from commit markers and promoted filters rebuild complete from the
    committed snapshots."""
    import os

    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    mk = lambda: CrawlConfig(max_pages=10_000, hot_hosts=2, hot_host_min_new=4)
    try:
        out_full = tempfile.mkdtemp(prefix="sc_hotfull_")
        out_res = tempfile.mkdtemp(prefix="sc_hotres_")
        try:
            crawl(spark, pages, rob, [seed], out_full, config=mk())
            cfg_partial = mk()
            cfg_partial.max_rounds = 2
            crawl(spark, pages, rob, [seed], out_res, config=cfg_partial)
            # marker from the partial run carries the hot tally
            import json

            with open(os.path.join(out_res, "_committed_1")) as fh:
                assert "hot_tally" in json.load(fh)
            crawl(spark, pages, rob, [seed], out_res, config=mk())
            key = lambda o: sorted(
                (r["url"], r["depth"], r["crawl_status"], r["status_code"])
                for r in read_crawl_log(spark, o).collect()
            )
            assert key(out_res) == key(out_full)
            seen = lambda o: {r["url"] for r in read_seen(spark, o).collect()}
            assert seen(out_res) == seen(out_full)
        finally:
            shutil.rmtree(out_full, ignore_errors=True)
            shutil.rmtree(out_res, ignore_errors=True)
    finally:
        pages.unpersist()
