"""Approximate nearest neighbor over embedding columns.

Two tiers (SURVEY.md training-data-pipeline ops):

- **Exact baseline**: brute-force cosine top-k
  (``analytics.ann_cosine_topk``) — one full scan per query vector.
- **Scale path (this module)**: random-hyperplane LSH. Each vector gets
  an ``n_planes``-bit bucket (bit i = sign of the dot product with
  deterministic hyperplane i); the index is a parquet table PARTITIONED
  by bucket, so a query reads only its own bucket plus the Hamming≤1
  probe buckets — partition pruning cuts the candidate scan by
  ~``2^n_planes / (n_planes+1)``× — and exact cosine re-ranks the
  candidate union.

Determinism contract: hyperplanes and sign bits are computed in
integer arithmetic (embedding values quantized with ``floor(x·10⁴)``,
hyperplane weights from a 32-bit LCG formula), so the Spark column, the
driver-side numpy mirror, and the DuckDB oracle produce bit-identical
buckets — no float summation-order hazards.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

N_PLANES = 8  # default plane count (2^8 buckets); see build_ann_index
_LCG_A = 1103515245
_LCG_B = 12345
_LCG_M = 2147483647
_CENTER = 1073741823  # ~M/2: weights land in [-center, M-1-center]
_QUANT = 10_000
_MANIFEST = "_MANIFEST.json"


def _weight_expr(plane: int, dim_col):
    """Hyperplane weight h(plane, d) as an integer Spark expression
    (64-bit throughout — the LCG product overflows int32)."""
    idx = (F.lit(plane * 64).cast("long") + dim_col.cast("long") + F.lit(1))
    return (
        F.lit(_LCG_A).cast("long") * idx + F.lit(_LCG_B)
    ) % F.lit(_LCG_M) - F.lit(_CENTER)


def weight_py(plane: int, d: int) -> int:
    """The same weight, driver-side."""
    return (_LCG_A * (plane * 64 + d + 1) + _LCG_B) % _LCG_M - _CENTER


def bucket_py(vec, n_planes: int = N_PLANES) -> int:
    """Driver-side bucket of one embedding (numpy mirror of the column)."""
    e = np.floor(np.asarray(vec, dtype=np.float64) * _QUANT).astype(np.int64)
    b = 0
    for i in range(n_planes):
        w = np.array([weight_py(i, d) for d in range(len(e))], dtype=np.int64)
        if int((e * w).sum()) > 0:
            b |= 1 << i
    return b


def with_bucket(
    emb: DataFrame, vec_col: str = "embedding", n_planes: int = N_PLANES
) -> DataFrame:
    """Append the ``bucket: int`` LSH column — pure builtins (posexplode
    + integer sums), JVM-side, no Python in the loop. All original
    columns survive (the embedding rides through the aggregation), so
    one shuffle produces the index rows directly — no re-join."""
    other = [c for c in emb.columns if c != vec_col]
    exploded = emb.select(
        *other,
        F.col(vec_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "val"),
    ).withColumn("e_int", F.floor(F.col("val") * _QUANT).cast("long"))
    aggs = [
        F.sum(F.col("e_int") * _weight_expr(i, F.col("d"))).alias(f"dot{i}")
        for i in range(n_planes)
    ] + [F.first(vec_col).alias(vec_col)]
    dots = exploded.groupBy(*other).agg(*aggs)
    bucket = None
    for i in range(n_planes):
        term = F.when(F.col(f"dot{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return dots.select(*other, vec_col, bucket.cast("int").alias("bucket"))


def build_ann_index(
    emb: DataFrame,
    out_path: str,
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    fs=None,
) -> dict:
    """Materialize the LSH index: the embedding table re-written
    PARTITIONED BY bucket (2^n_planes directories). On a cluster this is
    the one-off indexing job; searches after it scan only probe buckets.

    ``n_planes`` sizes the index for the corpus: 8 planes (256 buckets)
    suits ~10^5-10^6 vectors; at 10^9+ raise it (every +1 plane halves
    the expected bucket size and the per-probe scan). The written
    ``_MANIFEST.json`` records n_planes — searches read it back, so a
    query never needs to know how the index was built — plus per-bucket
    occupancy from the written files' parquet footers (no extra job):
    the skew diagnostic that tells an operator when to add planes.
    Returns the manifest dict.

    Manifest/occupancy IO goes through the same driver-side ``fs`` shim
    the crawl state uses (sparkcrawler.fs), so an index written to a
    non-POSIX ``out_path`` (s3/gcs via an fsspec-backed subclass) still
    gets a readable manifest — plain ``open``/``glob`` would silently
    produce none."""
    if fs is None:
        from sparkcrawler.fs import DEFAULT_FS as fs

    with_bucket(emb, vec_col, n_planes).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out_path)
    occupancy: dict[str, int] = {}
    for d in fs.glob(fs.join(out_path, "bucket=*")):
        b = d.rsplit("=", 1)[-1]
        occupancy[b] = sum(
            fs.parquet_num_rows(f) for f in fs.glob(fs.join(d, "*.parquet"))
        )
    counts = sorted(occupancy.values())
    manifest = {
        "n_planes": n_planes,
        "total_rows": sum(counts),
        "buckets_used": len(counts),
        "buckets_total": 1 << n_planes,
        "occupancy": occupancy,
        "max_bucket": counts[-1] if counts else 0,
        "median_bucket": counts[len(counts) // 2] if counts else 0,
    }
    fs.write_json_atomic(fs.join(out_path, _MANIFEST), manifest)
    return manifest


def read_manifest(index_path: str, fs=None) -> dict | None:
    if fs is None:
        from sparkcrawler.fs import DEFAULT_FS as fs

    p = fs.join(index_path, _MANIFEST)
    return fs.read_json(p) if fs.exists(p) else None


def probe_buckets(
    qbucket: int, hamming: int = 1, n_planes: int = N_PLANES
) -> list[int]:
    """Multiprobe set: bucket ids within the given Hamming radius of the
    query bucket (radius is the recall/scan-cost dial; any radius ≥ 0)."""
    from itertools import combinations

    out = {qbucket}
    for r in range(1, hamming + 1):
        for bits in combinations(range(n_planes), r):
            flip = 0
            for i in bits:
                flip |= 1 << i
            out.add(qbucket ^ flip)
    return sorted(out)


def ann_candidates(
    spark: SparkSession,
    index_path: str,
    query_vec,
    hamming: int = 1,
    n_planes: int | None = None,
) -> DataFrame:
    """The partition-pruned candidate scan of a materialized index: all
    index columns, restricted to the query's probe buckets. The
    ``bucket`` IN-filter hits the partition column → the scan reads
    only |probes| of the 2^n_planes partition directories. Callers
    re-rank however they like (``ann_search`` is the cosine top-k).
    ``n_planes`` defaults to the index's own manifest; a missing or
    unreadable manifest with no explicit ``n_planes`` RAISES rather than
    guessing — probing an index built under a different plane count
    computes the wrong buckets and silently loses recall."""
    if n_planes is None:
        mf = read_manifest(index_path)
        if mf is None:
            raise FileNotFoundError(
                f"no {_MANIFEST} under {index_path!r} and n_planes was not "
                "given — cannot determine the index geometry (probing with "
                "a guessed plane count silently loses recall); pass "
                "n_planes= explicitly to override"
            )
        n_planes = mf["n_planes"]
    probes = probe_buckets(bucket_py(query_vec, n_planes), hamming, n_planes)
    return spark.read.parquet(index_path).where(F.col("bucket").isin(probes))


def ann_search(
    spark: SparkSession,
    index_path: str,
    query_vec,
    k: int = 10,
    hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
) -> DataFrame:
    """Top-k cosine within the probe buckets of a materialized index."""
    idx = ann_candidates(spark, index_path, query_vec, hamming, n_planes)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    e = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(e, q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm_e = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    norm_q = float(np.sqrt(np.dot(query_vec, query_vec)))
    return (
        idx.withColumn("cos", dot / (norm_e * F.lit(norm_q)))
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
        .select(id_col, "bucket", F.round("cos", 4).alias("cos"))
    )
