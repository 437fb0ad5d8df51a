"""Streaming file sinks: checkpointed, exactly-once parquet landing.

The batch sinks (sinks/) assume a one-shot job; a streaming ingest needs
the other half of the contract — RESTART semantics. Spark's checkpointed
file sink gives exactly-once per-file delivery: the write-ahead offset log
records which source files each epoch consumed, and the output commit log
records which result files are valid, so a crashed/restarted query resumes
from the last committed epoch and readers (via the _spark_metadata dir)
never observe partial or duplicated epochs.

Scale notes: the availableNow trigger processes a backlog in bounded
micro-batches and terminates — the shape for scheduled incremental loads
(a cron'd "drain what's new" job over a landing zone). Combined with
streaming/dedup.py upstream, replayed source files do not re-land rows;
combined with maxFilesPerTrigger, backlog drains under bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_stream_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
) -> None:
    """Drain everything currently available into parquet, exactly once.

    Rerunning with the same checkpoint is a no-op for already-committed
    source files — the restart contract a landing pipeline relies on.
    Blocks until the drain completes (availableNow).
    """
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    q.awaitTermination()


def read_landed_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a streaming-sink output directory. Spark automatically consults
    `_spark_metadata` so only committed files are visible."""
    return spark.read.parquet(path)


def write_stream_restatement(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: list[str],
) -> None:
    """Streaming restatement into a date-partitioned lake table: each
    micro-batch dynamic-partition-overwrites exactly the partitions it
    contains (sinks/partitioned.py) — the streaming form of the daily
    restatement job, and the composition a CDC-fed lake runs continuously.

    Exactly-once here is the standard foreachBatch contract: the
    checkpoint gives at-least-once batch delivery, and a partition
    overwrite is IDEMPOTENT (replaying a batch rewrites the same
    partitions with the same rows), so the table converges to
    last-writer-wins per partition regardless of crashes or replays. The
    append-mode file sink above cannot restate history; this sink's whole
    purpose is that a late re-delivery of a day replaces the day.
    """
    from ..sinks.partitioned import overwrite_partitions

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        overwrite_partitions(batch_df, path, partition_cols)

    (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
