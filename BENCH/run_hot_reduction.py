"""Measured anti-join input reduction from per-host cuckoo filters.

The hot-host layer's claim (operators/cuckoo.py): a shared Bloom's
false-positive rate follows its GLOBAL fill, so the hosts that
generate the most candidates also send the most needless "suspects"
into the exact anti-join; a per-host cuckoo filter answers those hosts
near-exactly. This script measures that directly, at a realistic
operating point (Bloom at ~60% fill — a long crawl's steady state): one seen-set of N urls, one candidate batch skewed toward two
hot hosts, suspect counts (= exact-anti-join input) under

  (a) the shared PartitionedBloom alone,
  (b) Bloom + driver-resident HotHostSeenFilter,
  (c) DistributedBloom + DistributedHotHostFilter (executor regime).

True duplicates are suspects under every filter (no false negatives —
also asserted here); the reduction is the eliminated false-positive
traffic. Writes BENCH/hot_reduction.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

N_SEEN = 400_000
N_CAND_HOT = 120_000   # per hot host: mostly already-seen nav/footer links
N_CAND_COLD = 30_000
HOT_SEEN_FRAC = 0.5    # fraction of hot-host candidates that are dups


def main() -> None:
    sys.path.insert(0, os.path.dirname(HERE))
    from sparkcrawler.operators.cuckoo import (
        CuckooFilter,
        DistributedHotHostFilter,
        HotHostSeenFilter,
    )
    from sparkcrawler.operators.seen import DistributedBloom, PartitionedBloom
    from sparkcrawler.session import get_spark

    spark = get_spark(
        "hot-reduction", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    hosts = ["hot-a.example", "hot-b.example"]

    def urls(host, lo, n):
        return [(f"https://{host}/p/{i}", host) for i in range(lo, lo + n)]

    seen_rows = (
        urls(hosts[0], 0, N_SEEN // 3)
        + urls(hosts[1], 0, N_SEEN // 3)
        + urls("cold.example", 0, N_SEEN // 3)
    )
    from pyspark.sql import functions as F

    seen = (
        spark.createDataFrame(seen_rows, "url string, host string")
        .withColumn("url_hash", F.xxhash64("url"))
        .persist()
    )
    seen.count()

    n_dup = int(N_CAND_HOT * HOT_SEEN_FRAC)
    cand_rows = []
    for h in hosts:
        cand_rows += urls(h, 0, n_dup)                       # true dups
        cand_rows += urls(h, 10_000_000, N_CAND_HOT - n_dup)  # fresh
    cand_rows += urls("cold.example", 10_000_000, N_CAND_COLD)
    cand = (
        spark.createDataFrame(cand_rows, "url string, host string")
        .withColumn("url_hash", F.xxhash64("url"))
        .persist()
    )
    n_cand = cand.count()
    true_dups = 2 * n_dup

    # Bloom at a long-crawl operating point: m sized so fill ≈ 0.6
    # (1 - exp(-kn/m)) → per-key FP ≈ 0.6^5 ≈ 8% — the regime where a
    # filter sized for 10^10 urls has absorbed most of a crawl
    bits_per_shard = 1 << 17
    shards = 16
    seen_hashes = np.array(
        [r["url_hash"] for r in seen.select("url_hash").collect()],
        dtype=np.int64,
    )

    results = {
        "n_seen": len(seen_rows), "n_candidates": n_cand,
        "true_duplicates": true_dups,
        "bloom_bits_per_shard": bits_per_shard, "bloom_shards": shards, "k": 5,
    }

    pb = PartitionedBloom(shards, bits_per_shard)
    pb.add_hashes(seen_hashes)
    fill = float(
        np.unpackbits(pb.bitmaps.reshape(-1)).mean()
    )
    results["bloom_fill"] = round(fill, 4)

    def suspects(filter_obj):
        tagged = filter_obj.tag_maybe(cand, spark)
        return tagged.where(F.col("_maybe")).count()

    s_bloom = suspects(pb)

    hot_driver = HotHostSeenFilter(
        pb,
        {
            h: CuckooFilter.from_hashes(
                np.array(
                    [
                        r["url_hash"]
                        for r in seen.where(F.col("host") == h)
                        .select("url_hash")
                        .collect()
                    ],
                    dtype=np.int64,
                )
            )
            for h in hosts
        },
    )
    s_hot_driver = suspects(hot_driver)

    db = DistributedBloom(spark, shards, bits_per_shard)
    db.update_from_df(seen, n_rows=len(seen_rows))
    hot_dist = DistributedHotHostFilter(spark, db)
    hot_dist.ensure_hosts(hosts, seen)
    s_hot_dist = suspects(hot_dist)

    # correctness floor: every true duplicate must stay a suspect
    assert s_bloom >= true_dups and s_hot_driver >= true_dups
    assert s_hot_dist >= true_dups

    results.update(
        {
            "suspects_bloom_only": s_bloom,
            "suspects_hot_driver": s_hot_driver,
            "suspects_hot_distributed": s_hot_dist,
            "false_suspects_bloom_only": s_bloom - true_dups,
            "false_suspects_hot_driver": s_hot_driver - true_dups,
            "false_suspects_hot_distributed": s_hot_dist - true_dups,
            "antijoin_input_reduction_pct": round(
                100 * (s_bloom - s_hot_driver) / max(s_bloom, 1), 2
            ),
            "false_suspect_reduction_x": round(
                (s_bloom - true_dups) / max(s_hot_driver - true_dups, 1), 1
            ),
        }
    )
    with open(os.path.join(HERE, "hot_reduction.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
