"""Size-targeted parquet writer — the small-files / giant-files guard.

At 100 TB the file layout a job leaves behind IS the performance of every
job that reads it: thousands of KB-sized files drown the driver in task
scheduling and metadata round-trips, while a handful of multi-GB files
destroy read parallelism. Neither failure is visible at test scale, which
is exactly why the writer has to enforce the target, not the author.

``write_compacted_parquet`` sizes the output file count from Catalyst's
own size estimate of the input plan (optimizedPlan().stats — the same
number the broadcast-join planner trusts), corrected by parquet's
columnar compression ratio, so each output file lands near ``target_mb``.
The repartition uses round-robin (no columns), which also breaks any
skewed upstream partitioning; pass ``partition_cols`` to keep directory
partitioning with per-directory compaction instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# In-memory (uncompressed row) size vs parquet-on-disk: snappy+encoding on
# the fixture tables measures 3-6×; 4 is the planning convention.
_PARQUET_COMPRESSION_RATIO = 4.0


def estimated_plan_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the dataframe's optimized plan."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def target_partitions(df: DataFrame, target_mb: int = 128) -> int:
    est_disk = estimated_plan_bytes(df) / _PARQUET_COMPRESSION_RATIO
    return max(1, round(est_disk / (target_mb * 1024 * 1024)))


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    partition_cols: list[str] | None = None,
) -> int:
    """Write parquet with ~target_mb files; returns the file count used."""
    n = target_partitions(df, target_mb)
    w = (
        df.repartition(n, *partition_cols)
        if partition_cols
        else df.repartition(n)
    ).write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    return n
