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


# Catalyst reports Long.MaxValue when a plan has no usable statistics;
# anything near it (or any absurd count) means "unknown", not "huge".
_MAX_SANE_PARTITIONS = 1_000_000


def target_partitions(df: DataFrame, target_mb: int = 128) -> int:
    est_disk = estimated_plan_bytes(df) / _PARQUET_COMPRESSION_RATIO
    n = round(est_disk / (target_mb * 1024 * 1024))
    if not (0 < n <= _MAX_SANE_PARTITIONS):
        # unknown/absurd stats (e.g. local relations report Long.MaxValue):
        # fall back to the input's current partitioning rather than crash
        n = df.rdd.getNumPartitions() if n > _MAX_SANE_PARTITIONS else 1
    return max(1, n)


def write_compacted_parquet(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    partition_cols: list[str] | None = None,
    files_per_partition: int = 1,
) -> int:
    """Write parquet with ~target_mb files; returns the shuffle partition
    count used.

    With ``partition_cols``, hash-repartitioning on the columns alone would
    route each directory's rows to ONE task — one arbitrarily large file
    per directory, the exact failure this module guards against. A
    deterministic salt (xxhash of the whole row mod ``files_per_partition``)
    spreads each directory over that many files; size it as
    (largest stratum bytes / compression / target_mb)."""
    from pyspark.sql import functions as F

    n = target_partitions(df, target_mb)
    if partition_cols:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(max(1, files_per_partition)),
        )
        shuffled = df.repartition(n, *partition_cols, salt)
    else:
        shuffled = df.repartition(n)
    w = shuffled.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)
    return n
