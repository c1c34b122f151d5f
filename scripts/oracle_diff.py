"""Differential check of catalog queries vs their DuckDB oracles at an
arbitrary scale factor (the in-repo pytest check runs at sf0.01; this
lets an optimization be proven result-identical at sf0.1/sf1.0 before
committing).

Usage: python scripts/oracle_diff.py [--sf DIR] [q1 q2 ... | --all]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 6)
        if r == 0.0:
            r = 0.0  # fold -0.0 into +0.0: equal values, different repr
        return f"{r:.6f}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 16)))
    args = ap.parse_args()

    import duckdb

    from sparkcrawler.analytics import CATALOG
    from sparkcrawler.session import get_spark

    spark = get_spark(
        "oracle-diff", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = [n for n, s in CATALOG.items() if s.sql is not None] \
        if args.all else args.queries
    failed = []
    for name in names:
        spec = CATALOG[name]
        sdf = spec.spark(spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(spec.sql)
        drows = rel.fetchall()
        ok_cols = sorted(sdf.columns) == sorted(rel.columns)
        got, want = _norm(srows, sdf.columns), _norm(drows, rel.columns)
        ok = ok_cols and got == want
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"({len(srows)} vs {len(drows)} rows)")
        if not ok:
            failed.append(name)
            diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
            print(f"  first diffs: {diffs}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
