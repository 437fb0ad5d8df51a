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
