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


# ------------------------- round 4: executor-side hot-host filter shards --


def test_distributed_filter_matches_driver_filter(spark):
    """DistributedHotHostFilter must give the same _maybe answers as the
    driver-resident HotHostSeenFilter over identical state."""
    from pyspark.sql import functions as F

    from sparkcrawler.operators.cuckoo import DistributedHotHostFilter
    from sparkcrawler.operators.seen import PartitionedBloom

    seen_a = _hashes(400, seed=11)
    seen_b = _hashes(300, seed=12)
    bloom = PartitionedBloom(4, 1 << 16)
    bloom.add_hashes(np.concatenate([seen_a, seen_b]))

    seen_df = spark.createDataFrame(
        [("a.example", int(h)) for h in seen_a]
        + [("b.example", int(h)) for h in seen_b],
        "host string, url_hash long",
    )
    dist = DistributedHotHostFilter(spark, bloom)
    dist.ensure_hosts({"a.example", "b.example"}, seen_df)

    driver = HotHostSeenFilter(
        bloom,
        {
            "a.example": CuckooFilter.from_hashes(seen_a),
            "b.example": CuckooFilter.from_hashes(seen_b),
        },
    )

    probe = (
        [("a.example", int(h)) for h in seen_a[:60]]
        + [("a.example", int(h)) for h in _hashes(60, seed=13)]
        + [("b.example", int(h)) for h in seen_b[:60]]
        + [("cold.example", int(h)) for h in seen_a[:30]]
    )
    cand = spark.createDataFrame(probe, "host string, url_hash long")
    key = lambda rows: sorted(
        (r["host"], r["url_hash"], r["_maybe"]) for r in rows
    )
    got_d = key(dist.tag_maybe(cand, spark).collect())
    got_b = key(driver.tag_maybe(cand, spark).collect())
    assert got_d == got_b
    # delta update keeps answering correctly (no false negatives)
    delta = _hashes(100, seed=14)
    delta_df = spark.createDataFrame(
        [("a.example", int(h)) for h in delta], "host string, url_hash long"
    )
    dist.update_from_df(delta_df, seen_df.unionByName(delta_df))
    cand2 = spark.createDataFrame(
        [("a.example", int(h)) for h in delta], "host string, url_hash long"
    )
    assert all(r["_maybe"] for r in dist.tag_maybe(cand2, spark).collect())
    dist.release()
    driver.release()


def test_distributed_filter_delta_without_state_row(spark):
    """ensure_hosts must not admit a zero-seen host (it would count in
    hot_active while permanently Bloom-fallback), and a delta for a host
    with no state row must end in an exact rebuild from seen_df — not a
    silent drop, and not a delta-only filter (whose misses would read as
    'definitely unseen' for pre-delta URLs)."""
    from sparkcrawler.operators.cuckoo import DistributedHotHostFilter
    from sparkcrawler.operators.seen import PartitionedBloom

    seen_a = _hashes(200, seed=21)
    bloom = PartitionedBloom(4, 1 << 16)
    bloom.add_hashes(seen_a)
    seen_df = spark.createDataFrame(
        [("a.example", int(h)) for h in seen_a], "host string, url_hash long"
    )
    dist = DistributedHotHostFilter(spark, bloom)
    dist.ensure_hosts({"a.example", "ghost.example"}, seen_df)
    assert dist.hosts == {"a.example"}

    # direct-API trap: a hot host whose state row is missing
    dist.hosts.add("b.example")
    hist = _hashes(150, seed=22)  # b's full history; delta = last 50
    seen_b = spark.createDataFrame(
        [("b.example", int(h)) for h in hist], "host string, url_hash long"
    )
    delta_df = spark.createDataFrame(
        [("b.example", int(h)) for h in hist[100:]],
        "host string, url_hash long",
    )
    dist.update_from_df(delta_df, seen_df.unionByName(seen_b))
    # b's filter must now be EXACT: pre-delta history still answers maybe
    cand = spark.createDataFrame(
        [("b.example", int(h)) for h in hist[:100]]
        + [("a.example", int(h)) for h in seen_a[:50]],
        "host string, url_hash long",
    )
    assert all(r["_maybe"] for r in dist.tag_maybe(cand, spark).collect())
    # and the rebuild flag cleared (no lingering n_buckets=0 rows)
    assert all(
        r["n_buckets"] > 0
        for r in dist.tables_df.select("n_buckets").collect()
    )
    dist.release()


def test_distributed_bloom_hot_crawl_identical(spark):
    """North-star regime: DISTRIBUTED bloom + hot-host cuckoo shards —
    bit-identical to the plain anti-join crawl, with the hot layer
    actually active (round stats prove it ran distributed)."""
    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    logs, seens, stats = [], [], []
    try:
        for cfg in (
            CrawlConfig(max_pages=10_000, use_bloom=False),
            CrawlConfig(
                max_pages=10_000, bloom_mode="distributed",
                hot_hosts=2, hot_host_min_new=4,
            ),
        ):
            out = tempfile.mkdtemp(prefix="sc_hotdist_")
            try:
                res = crawl(spark, pages, rob, [seed], out, config=cfg)
                stats.append(res.round_stats)
                logs.append(
                    sorted(
                        (r["url"], r["depth"], r["crawl_status"], r["status_code"])
                        for r in read_crawl_log(spark, out).collect()
                    )
                )
                seens.append({r["url"] for r in read_seen(spark, out).collect()})
            finally:
                shutil.rmtree(out, ignore_errors=True)
    finally:
        pages.unpersist()
    assert logs[0] == logs[1]
    assert seens[0] == seens[1]
    assert len(logs[0]) > 40
    hot_rounds = [s for s in stats[1] if s.get("hot_active", 0) > 0]
    assert hot_rounds, "hot filters never activated"
    assert all(s["hot_mode"] == "distributed" for s in hot_rounds)


def test_big_round_migrates_distributed_no_driver_hashes(spark):
    """A round past bloom_driver_update_limit must NOT demote the hot
    layer and must NOT read url_hash driver-side: the filters migrate to
    executor-side shards (RecordingFS-asserted)."""
    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df
    from tests.test_crawl import RecordingFS

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    try:
        outs = []
        cfgs = [
            CrawlConfig(max_pages=10_000),
            CrawlConfig(
                max_pages=10_000, hot_hosts=2, hot_host_min_new=4,
                bloom_driver_update_limit=0,  # every round is "too big"
            ),
        ]
        fss = [None, RecordingFS()]
        logs, seens, stats = [], [], []
        try:
            for cfg, fs in zip(cfgs, fss):
                out = tempfile.mkdtemp(prefix="sc_hotmig_")
                outs.append(out)
                res = crawl(spark, pages, rob, [seed], out, config=cfg, fs=fs)
                stats.append(res.round_stats)
                logs.append(
                    sorted(
                        (r["url"], r["depth"], r["crawl_status"], r["status_code"])
                        for r in read_crawl_log(spark, out).collect()
                    )
                )
                seens.append({r["url"] for r in read_seen(spark, out).collect()})
        finally:
            for out in outs:
                shutil.rmtree(out, ignore_errors=True)
    finally:
        pages.unpersist()
    assert logs[0] == logs[1]
    assert seens[0] == seens[1]
    # the driver never read a url_hash column in the hot run
    for path, cols in fss[1].reads:
        assert cols is None or "url_hash" not in cols, (path, cols)
    # the hot layer ran — distributed, never demoted
    hot_rounds = [s for s in stats[1] if s.get("hot_active", 0) > 0]
    assert hot_rounds, "hot filters never activated"
    assert all(s["hot_mode"] == "distributed" for s in hot_rounds)
    # once active, stays active to the end (no demotion)
    first = min(s["round"] for s in hot_rounds)
    tail = [s for s in stats[1] if s["round"] >= first]
    assert all(s.get("hot_active", 0) > 0 for s in tail)


def test_broadcast_to_distributed_migration_mid_crawl(spark):
    """Driver-resident filters promoted early must MIGRATE (not clear)
    when a later round exceeds the driver-fold limit."""
    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    logs, seens, stats = [], [], []
    try:
        for cfg in (
            CrawlConfig(max_pages=10_000),
            CrawlConfig(
                max_pages=10_000, hot_hosts=2, hot_host_min_new=2,
                bloom_driver_update_limit=8,  # rounds outgrow this fast
            ),
        ):
            out = tempfile.mkdtemp(prefix="sc_hotmid_")
            try:
                res = crawl(spark, pages, rob, [seed], out, config=cfg)
                stats.append(res.round_stats)
                logs.append(
                    sorted(
                        (r["url"], r["depth"], r["crawl_status"], r["status_code"])
                        for r in read_crawl_log(spark, out).collect()
                    )
                )
                seens.append({r["url"] for r in read_seen(spark, out).collect()})
            finally:
                shutil.rmtree(out, ignore_errors=True)
    finally:
        pages.unpersist()
    assert logs[0] == logs[1]
    assert seens[0] == seens[1]
    modes = [s.get("hot_mode") for s in stats[1]]
    assert "distributed" in modes, modes


def test_resume_after_migration_stays_distributed(spark):
    """A crawl that migrated its hot filters executor-side must RE-ENTER
    the distributed regime on resume (round markers record hot_mode) —
    never rebuild driver-resident filters, which would pull every hot
    host's full url_hash set onto the driver (RecordingFS-asserted)."""
    from sparkcrawler.plans.crawl import (
        CrawlConfig, crawl, read_crawl_log, read_seen,
    )
    from sparkcrawler.sources.synth import page_url, robots_df, synth_pages_df
    from tests.test_crawl import RecordingFS

    layout, pages = synth_pages_df(spark, 200, 3)
    pages = pages.cache()
    rob = robots_df(spark, layout)
    seed = page_url(1, 0)
    hot_kw = dict(
        max_pages=10_000, hot_hosts=2, hot_host_min_new=4,
        bloom_driver_update_limit=0,  # every round is "too big"
    )
    out_full = tempfile.mkdtemp(prefix="sc_hotres_full_")
    out_res = tempfile.mkdtemp(prefix="sc_hotres_resume_")
    try:
        full = crawl(
            spark, pages, rob, [seed], out_full, config=CrawlConfig(**hot_kw)
        )
        mig_round = min(
            s["round"] for s in full.round_stats if s.get("hot_active", 0) > 0
        )
        # interrupted leg: stop right after the migrated round commits
        first = crawl(
            spark, pages, rob, [seed], out_res,
            config=CrawlConfig(**hot_kw, max_rounds=mig_round + 1),
        )
        assert first.round_stats[-1]["hot_mode"] == "distributed"
        fs = RecordingFS()
        second = crawl(
            spark, pages, rob, [seed], out_res,
            config=CrawlConfig(**hot_kw), fs=fs,
        )
        # resume re-entered the distributed regime, never driver mode...
        hot_rounds = [
            s for s in second.round_stats if s.get("hot_active", 0) > 0
        ]
        assert hot_rounds
        assert all(
            s.get("hot_mode") != "driver" for s in second.round_stats
        ), second.round_stats
        # ...and never pulled a hash column onto the driver
        for path, cols in fs.reads:
            assert cols is None or "url_hash" not in cols, (path, cols)
        # and the interrupted+resumed crawl is bit-identical
        key = lambda out: sorted(
            (r["url"], r["depth"], r["crawl_status"], r["status_code"])
            for r in read_crawl_log(spark, out).collect()
        )
        assert key(out_full) == key(out_res)
        assert {r["url"] for r in read_seen(spark, out_full).collect()} == {
            r["url"] for r in read_seen(spark, out_res).collect()
        }
    finally:
        pages.unpersist()
        shutil.rmtree(out_full, ignore_errors=True)
        shutil.rmtree(out_res, ignore_errors=True)


def test_stash_keeps_saturated_filter_correct():
    """ADVICE fix: a failed insert's kick chain must not lose keys —
    the homeless victim lands in the stash, so every inserted key is
    still found even after saturation."""
    f = CuckooFilter(16)  # 64 slots
    hs = _hashes(200, seed=21)
    ok = f.insert_many(hs)
    assert not ok  # saturation reported...
    assert f.contains_many(hs).all()  # ...but NO false negatives
    assert len(f.stash) > 0
    # round-trip through serialized state keeps the stash
    f2 = CuckooFilter.from_state(*f.to_state())
    assert f2.contains_many(hs).all()
    # stash entries are deletable
    stash_before = len(f2.stash)
    # find a key currently answered via the stash: delete from table
    # copies first, then the stash entry must still be removable
    assert f2.count == f.count
