"""Insert-or-update semantics (reference S9: data.py:201-208 retries a
failed INSERT as an UPDATE on the primary key).

Parquet has no MERGE INTO, so the Spark-native equivalent is
dedup-on-write: union existing rows with updates and keep the newest
row per key — ``row_number() over (partition by key order by version
desc) = 1``. On Iceberg/Delta this maps 1:1 to MERGE INTO; the window
formulation below shuffles only on the key, exactly what MERGE does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
) -> DataFrame:
    """Latest-row-per-key union of ``existing`` and ``updates``.

    ``updates`` wins ties on ``version_col`` (insert-or-update: a new
    row for an existing key replaces it; otherwise it is appended).
    """
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
