"""Extra benchmarks for the optimization round (bench.py is frozen).

Times individual catalog queries in isolation with the same session
shape as bench.py (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus,
AQE off by default) and optionally dumps each query's
``explain("formatted")`` to plans/r07/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--sf SF_DIR] [--reps N] [--tag before|after|'']
                        [--no-explain] q1 q2 ...
  python bench_extra.py --all          # every HEADLINE query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--no-explain", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    from sparkcrawler.session import get_spark

    extra_conf = {
        "spark.sql.warehouse.dir": "/tmp/sparkcrawler_bench/warehouse",
        "spark.driver.extraJavaOptions":
            "-Dderby.system.home=/tmp/sparkcrawler_bench/derby",
    }
    if os.environ.get("SPARK_BENCH_AQE", "0") == "0":
        extra_conf["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(
        "sparkcrawler-bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=cpus, extra_conf=extra_conf,
    )

    from sparkcrawler import analytics
    from sparkcrawler.analytics import CATALOG

    if args.all:
        import bench
        names = list(bench.HEADLINE)
    else:
        names = args.queries
    # the crawl-family / ann queries need their one-off inputs
    if any(n.startswith(("crawl_", "pages_", "ann_")) for n in names):
        analytics._demo_crawl_dir(spark)
        analytics._outdegree_expected_dir()
        t0 = time.time()
        analytics._ann_index_dir(spark, args.sf)
        print(f"# ann_index_build {time.time() - t0:.3f}s", file=sys.stderr)

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r07")
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        spec = CATALOG[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            rows = spec.spark(spark, args.sf).collect()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "samples": samples,
                     "rows": len(rows)}
        if args.tag and not args.no_explain:
            txt = spec.spark(spark, args.sf)._sc._jvm.PythonSQLUtils \
                .explainString(
                    spec.spark(spark, args.sf)._jdf.queryExecution(),
                    "formatted")
            with open(os.path.join(
                    plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)
        print(f"{name}: {samples} rows={len(rows)}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf, "cpus": cpus, "timings": out}))


if __name__ == "__main__":
    main()
