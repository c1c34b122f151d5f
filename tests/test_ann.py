"""Bucketed ANN (random-hyperplane LSH): index build, partition-pruned
search, recall vs the exact brute-force baseline, and the determinism
contract between the Spark bucket column and the driver-side mirror."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkcrawler.operators.ann import (
    N_PLANES,
    ann_search,
    bucket_py,
    build_ann_index,
    probe_buckets,
    with_bucket,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    yield df
    # release: test_queries' no-persist-leak fixture audits the shared
    # session after this module runs
    df.unpersist()


@pytest.fixture(scope="module")
def index_dir(spark, emb):
    d = tempfile.mkdtemp(prefix="sc_annidx_")
    build_ann_index(emb, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_bucket_column_matches_driver_mirror(spark, emb):
    rows = with_bucket(emb).select("vec_id", "bucket", "embedding").collect()
    assert rows
    for r in rows[:50]:
        assert r["bucket"] == bucket_py(r["embedding"]), r["vec_id"]


def test_index_is_bucket_partitioned(spark, index_dir):
    import glob

    parts = glob.glob(f"{index_dir}/bucket=*")
    assert len(parts) > 1  # vectors spread over multiple buckets
    df = spark.read.parquet(index_dir)
    assert "bucket" in df.columns


def test_search_scan_is_partition_pruned(spark, index_dir, emb):
    q = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    res = ann_search(spark, index_dir, q, k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    # the scan must not read every bucket directory
    probes = probe_buckets(bucket_py(q), hamming=1)
    assert len(probes) == N_PLANES + 1


def test_probe_buckets_hamming():
    assert probe_buckets(0, hamming=0) == [0]
    assert len(probe_buckets(0, hamming=1)) == 1 + N_PLANES
    assert len(probe_buckets(0, hamming=2)) == 1 + N_PLANES + N_PLANES * (N_PLANES - 1) // 2


def _brute_topk(emb_rows, qv, k=10):
    q = np.asarray(qv, dtype=np.float64)
    scored = []
    for r in emb_rows:
        e = np.asarray(r["embedding"], dtype=np.float64)
        cos = float(e @ q / (np.linalg.norm(e) * np.linalg.norm(q)))
        scored.append((-cos, r["vec_id"]))
    scored.sort()
    return [v for _, v in scored[:k]]


def test_search_recall_vs_brute_force(spark, index_dir, emb):
    """Measured recall@10 over 5 query vectors with Hamming≤2 probes.
    LSH is approximate by design; the assertion is the LIFT: recall
    must beat the scanned data fraction by ≥1.5× (random bucketing
    would give recall ≈ scan fraction)."""
    rows = emb.collect()
    with_b = {r["vec_id"]: r for r in with_bucket(emb).collect()}
    n = len(rows)
    recalls, fracs = [], []
    for qid in range(5):
        qv = next(r["embedding"] for r in rows if r["vec_id"] == qid)
        truth = set(
            _brute_topk([r for r in rows if r["vec_id"] != qid], qv, 10)
        )
        got = {
            r["vec_id"]
            for r in ann_search(spark, index_dir, qv, k=10, hamming=2).collect()
            if r["vec_id"] != qid
        }
        probes = set(probe_buckets(bucket_py(qv), hamming=2))
        fracs.append(
            sum(1 for r in with_b.values() if r["bucket"] in probes) / n
        )
        recalls.append(len(truth & got) / 10)
    avg_recall = sum(recalls) / len(recalls)
    avg_frac = sum(fracs) / len(fracs)
    assert avg_recall >= 1.5 * avg_frac, (recalls, fracs)
    assert avg_recall >= 0.2, recalls


def test_search_exact_within_probed_buckets(spark, index_dir, emb):
    """Within the probed buckets the re-rank is exact: ann_search's
    result equals the brute-force top-k restricted to those buckets."""
    rows = with_bucket(emb).collect()
    qv = next(r["embedding"] for r in rows if r["vec_id"] == 0)
    probes = set(probe_buckets(bucket_py(qv), hamming=1))
    cand = [r for r in rows if r["bucket"] in probes]
    want = set(_brute_topk(cand, qv, 10))
    res = ann_search(spark, index_dir, qv, k=10).collect()
    got = {r["vec_id"] for r in res}
    assert got == want
    cos_vals = [r["cos"] for r in res]
    assert cos_vals == sorted(cos_vals, reverse=True)


def test_catalog_ann_query_is_partition_pruned(spark):
    """The CATALOG ann_lsh_topk goes through the materialized index:
    its physical plan must show partition pruning on bucket (not a
    full-candidate BroadcastNestedLoopJoin re-derivation)."""
    from sparkcrawler.analytics import ann_lsh_topk

    df = ann_lsh_topk(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------- round 4: parameterized planes + manifest ----------


@pytest.fixture(scope="module")
def index12_dir(spark, emb):
    d = tempfile.mkdtemp(prefix="sc_annidx12_")
    manifest = build_ann_index(emb, d, n_planes=12)
    yield d, manifest
    shutil.rmtree(d, ignore_errors=True)


def test_manifest_records_build_and_occupancy(spark, emb, index12_dir):
    d, manifest = index12_dir
    from sparkcrawler.operators.ann import read_manifest

    assert read_manifest(d) == manifest
    assert manifest["n_planes"] == 12
    assert manifest["buckets_total"] == 4096
    assert manifest["total_rows"] == emb.count()
    assert sum(manifest["occupancy"].values()) == manifest["total_rows"]
    assert manifest["max_bucket"] >= manifest["median_bucket"] >= 1


def test_12_plane_bucket_mirror_and_search(spark, emb, index12_dir):
    """At 12 planes: Spark bucket == driver mirror, searches read the
    plane count from the manifest, the scan stays partition-pruned, and
    the re-rank is exact within the probed buckets."""
    d, _ = index12_dir
    rows = with_bucket(emb, n_planes=12).collect()
    for r in rows[:30]:
        assert r["bucket"] == bucket_py(r["embedding"], n_planes=12)
    qv = next(r["embedding"] for r in rows if r["vec_id"] == 0)
    # n_planes NOT passed: ann_search must pick 12 up from the manifest
    res = ann_search(spark, d, qv, k=10, hamming=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    probes = set(probe_buckets(bucket_py(qv, 12), hamming=1, n_planes=12))
    assert len(probes) == 13
    cand = [r for r in rows if r["bucket"] in probes]
    want = set(_brute_topk(cand, qv, 10))
    got = {r["vec_id"] for r in res.collect()}
    assert got == want


def test_12_plane_recall_lift(spark, emb, index12_dir):
    """More planes → smaller scan fraction; recall lift must hold."""
    d, _ = index12_dir
    rows = emb.collect()
    with_b = {r["vec_id"]: r["bucket"] for r in with_bucket(emb, n_planes=12).collect()}
    n = len(rows)
    recalls, fracs = [], []
    for qid in range(5):
        qv = next(r["embedding"] for r in rows if r["vec_id"] == qid)
        truth = set(_brute_topk([r for r in rows if r["vec_id"] != qid], qv, 10))
        got = {
            r["vec_id"]
            for r in ann_search(spark, d, qv, k=10, hamming=2).collect()
            if r["vec_id"] != qid
        }
        probes = set(probe_buckets(bucket_py(qv, 12), hamming=2, n_planes=12))
        fracs.append(sum(1 for b in with_b.values() if b in probes) / n)
        recalls.append(len(truth & got) / 10)
    avg_recall = sum(recalls) / len(recalls)
    avg_frac = sum(fracs) / len(fracs)
    assert avg_frac < 0.5  # 12 planes actually shrank the scan
    assert avg_recall >= 1.5 * avg_frac, (recalls, fracs)


def test_probe_buckets_radius_3():
    from math import comb

    assert len(probe_buckets(0, hamming=3, n_planes=12)) == (
        1 + comb(12, 1) + comb(12, 2) + comb(12, 3)
    )


def test_ivf_assignment_and_recall(spark):
    """IVF-flat with one integer-exact Lloyd step: coarse anchors
    self-assign (their own list is their L2 argmin by construction),
    the refined assignment still lands every vector in exactly one of
    the K lists, the probed lists cover a sublinear candidate
    fraction, and recall beats the random-scan baseline (recall ≈
    fraction) by ≥1.5×."""
    from sparkcrawler.analytics import (
        CATALOG, IVF_K, IVF_NPROBE, _ivf_assign, _ivf_refined,
    )

    sf = "/root/testdata/sf0.01"
    coarse = {
        r["vec_id"]: r["cluster"] for r in _ivf_assign(spark, sf).collect()
    }
    for aid in range(1, IVF_K + 1):
        assert coarse[aid] == aid  # sampled anchors self-assign
    refined_df, _ = _ivf_refined(spark, sf)
    clusters = {r["vec_id"]: r["cluster"] for r in refined_df.collect()}
    assert set(clusters.values()) <= set(range(1, IVF_K + 1))
    got = [tuple(r) for r in CATALOG["ann_ivf_topk"].spark(spark, sf).collect()]
    assert len(got) == 10
    probed = {c for _, _, c, _ in got}
    assert len(probed) <= IVF_NPROBE
    brute = {
        r["vec_id"]
        for r in CATALOG["ann_cosine_topk"].spark(spark, sf).collect()
    }
    n = sum(1 for v in clusters if v > 0)
    # candidate fraction actually scanned: members of the probed lists
    qprobes = {c for v, c in clusters.items() if v in {g[0] for g in got}}
    frac = sum(1 for v, c in clusters.items() if c in qprobes and v > 0) / n
    recall = len(brute & {g[0] for g in got}) / 10
    assert frac < 0.5, frac
    assert recall >= 1.5 * frac, (recall, frac)


def test_ivf_lloyd_step_improves_quantizer(spark):
    """The Lloyd step's point: refined centroids fit the data at least
    as well as the raw sampled anchors (strictly lower total quantized
    squared-L2 distortion — the k-means objective, exact int64 here),
    and recall-per-scanned-candidate does not degrade. Both engines
    compute the identical refined grid (floor-mean over int64 sums),
    so this improvement is engine-independent."""
    from pyspark.sql import functions as F

    from sparkcrawler.analytics import _ivf_assign, _ivf_refined

    sf = "/root/testdata/sf0.01"
    # distortion = Σ(dist + ‖e‖²) — the fold drops the constant ‖e‖²,
    # which cancels when comparing the SAME vectors under two quantizers
    d0 = (
        _ivf_assign(spark, sf)
        .where(F.col("vec_id") > 0)
        .agg(F.sum("dist"))
        .head()[0]
    )
    refined_df, _ = _ivf_refined(spark, sf)
    d1 = refined_df.where(F.col("vec_id") > 0).agg(F.sum("dist")).head()[0]
    assert d1 < d0, (d1, d0)
