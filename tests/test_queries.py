"""Driver-contract differential tests: every CATALOG query vs its
DuckDB oracle at sf0.01 — row count, column names, and values must
match (mimics the driver's CORRECTNESS check)."""

from __future__ import annotations

import math

import duckdb
import pytest

from sparkcrawler.analytics import CATALOG

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


SQL_QUERIES = sorted(n for n, s in CATALOG.items() if s.sql is not None)
ROWS_ONLY = sorted(n for n, s in CATALOG.items() if s.sql is None)


@pytest.fixture(autouse=True)
def no_persist_leak(request, spark):
    """Every catalog query must leave executor storage no fuller than it
    found it: whatever a query persists internally (pagerank's edge
    list, the crawl demo build's round caches, Bloom shard bitmaps)
    must be unpersisted by the time its action returns — a long-lived
    session running the catalog repeatedly at scale must not accrete
    pinned blocks. Baseline-delta (not absolute-zero) plus gc.collect()
    so the check cannot race the ContextCleaner over RDDs released
    asynchronously by earlier test modules in the same session."""
    import gc

    gc.collect()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    yield
    gc.collect()
    leaked = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert leaked <= baseline, (
        f"{request.node.name}: persisted RDDs grew {baseline} -> {leaked} "
        "after query"
    )


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_duckdb_oracle(spark, duck, name):
    spec = CATALOG[name]
    sdf = spec.spark(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.sql)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}"
    )
    got, want = _norm(srows, scols), _norm(drows, dcols)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = CATALOG[name].spark(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns  # stable schema
