"""Generate a driver-shaped synthetic testdata dir at an arbitrary SF.

The driver's round-end measurement escalates to a larger, driver-generated
scale factor (BENCH_r06.json: sf=1.0) whose files do not survive sandbox
rebuilds. This tool regenerates a *statistically matched* stand-in from the
row-count law visible across the provided SFs (docs = 50k x sf,
embeddings = 20k x sf, events = 1M x sf, lineitem = 6M x sf,
orders = 1.5M x sf, ...) and the measured sf0.1 distributions (31-word
vocabulary, 9% planted near-dup spans + 0.3% exact dups, unit-norm
float32[64] embeddings, 30-day event window, TPC-H-ish dimension shapes).

It is a MEASUREMENT tool only: correctness is still gated on the driver's
own sf0.001/0.01/0.1 files (the DuckDB oracle reads whatever dir it is
given, so oracle diffs also run green on this data). Nothing here feeds
any query result.

Usage: python BENCH/gen_sf.py 1.0 /tmp/sfgen/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "line", "part", "order", "sort", "fast",
    "scan", "hash", "slow", "group", "batch", "query", "agg", "big",
    "join", "filter", "key", "the", "a", "customer", "row", "pipeline",
]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    words = VOCAB
    for i in range(n):
        wc = int(rng.integers(7, 101))
        w = [words[j] for j in rng.integers(0, len(words), wc)]
        r = rng.random()
        if i > 10 and r < 0.0032:           # exact dup of an earlier doc
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.045 + 0.0032:   # near-dup: splice a long span
            src = texts[int(rng.integers(0, i))].split()
            span = min(len(src), int(rng.integers(20, 51)))
            s0 = int(rng.integers(0, max(1, len(src) - span + 1)))
            pos = int(rng.integers(0, max(1, len(w) // 2)))
            w = w[:pos] + src[s0:s0 + span] + w[pos:]
        texts.append(" ".join(w))
    lang = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([str(x) for x in lang]),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    n_users = max(150, n // 66)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = t0 + np.sort(rng.integers(0, span_us, n)).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "signup", "purchase", "error"], n)
        ),
        "value": pa.array(np.round(rng.random(n) * 150, 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    })


def _days(rng, n, lo="1995-01-01", hi="2001-08-01"):
    a = np.datetime64(lo)
    d = (np.datetime64(hi) - a).astype(int)
    return (a + rng.integers(0, d + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def gen_tpch(sf: float, rng: np.random.Generator, out: str) -> None:
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_li = int(6_000_000 * sf)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.random(n_cust) * 10000, 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"],
            n_cust)),
    }), f"{out}/customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.random(n_supp) * 10000, 2)),
    }), f"{out}/supplier.parquet")
    adj = ["large", "hot", "cold", "small", "shiny", "dull", "new", "old"]
    noun = ["ring", "bolt", "nut", "cog", "pin", "cap", "rod", "gear"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([f"{adj[i % 8]} {noun[(i // 8) % 8]}"
                            for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{k}" for k in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(
            ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO"], n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + rng.random(n_part) * 1100, 2)),
    }), f"{out}/part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_ord)),
        "o_totalprice": pa.array(np.round(rng.random(n_ord) * 400_000, 2)),
        "o_orderdate": pa.array(_days(rng, n_ord), pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
            n_ord)),
    }), f"{out}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(float)),
        "l_extendedprice": pa.array(np.round(rng.random(n_li) * 100_000, 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) * 0.01, 2)),
        "l_returnflag": pa.array(rng.choice(["N", "A", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": pa.array(_days(rng, n_li), pa.timestamp("us")),
    }), f"{out}/lineitem.parquet")


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(int(50_000 * sf), rng),
                   f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(int(20_000 * sf), rng),
                   f"{out}/embeddings.parquet")
    pq.write_table(gen_events(int(1_000_000 * sf), rng),
                   f"{out}/events.parquet")
    gen_tpch(sf, rng, out)
    # small dims: copy verbatim from the provided sf0.1
    import shutil
    for t in ("region", "nation"):
        shutil.copy(f"/root/testdata/sf0.1/{t}.parquet", f"{out}/{t}.parquet")
    open(f"{out}/_DONE", "w").close()
    print("wrote", out)


if __name__ == "__main__":
    main()
