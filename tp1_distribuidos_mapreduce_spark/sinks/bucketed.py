"""Bucketed parquet tables: the co-located-join storage layout.

At 100 TB the dominant cost of fact-fact joins (lineitem⋈orders) is the
shuffle. Writing both tables bucketed by the join key — Spark's
``bucketBy``, hash(key) % N files per partition plus metastore metadata —
lets the planner prove both sides are already hash-partitioned the same
way and emit a sort-merge join with NO Exchange on either side; repeated
joins amortize the one-time layout cost every run.

The reference's nearest concept is its static hash partitioning of map
output into R files (cmd/worker/worker.go:75-79, 101-119), which is a
transient per-job shuffle; bucketing persists that property into storage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed parquet table. ``sort_cols``
    additionally sorts within each bucket file, which lets a downstream
    sort-merge join skip its Sort as well."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket metadata only
    exists there — reading the parquet path directly loses it)."""
    return spark.table(table)
