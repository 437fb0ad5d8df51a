"""Readers for the driver-generated fixture tables (TESTDATA.md).

One parquet file per table; columnar scan with Catalyst pushdown/pruning —
the Spark-native replacement for the reference's whole-text-file scan
(cmd/worker/worker.go:41-48), which had no notion of schema, projection, or
predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or near-fixed in TPC-H-style schemas: region=5,
# nation=25). Join planners should broadcast these unconditionally.
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def fixture_cache_tag(sf_dir: str, name: str, *extra: object) -> str:
    """Content-addressed tag for /tmp artifacts derived from a fixture
    table: md5 over the parquet's path, size, and mtime, plus any
    derivation parameters. A regenerated fixture (same path, new bytes) or
    a changed derivation spec produces a NEW tag — and therefore a fresh
    cache path/table — instead of a stale-reuse: the failure mode this
    prevents is a _SUCCESS-marker cache serving old data while the DuckDB
    oracle reads the fresh parquet."""
    import hashlib

    p = os.path.join(sf_dir, f"{name}.parquet")
    st = os.stat(p)
    key = "|".join([p, str(st.st_size), str(st.st_mtime_ns), *map(str, extra)])
    return hashlib.md5(key.encode()).hexdigest()[:12]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read it as raw nanos (legacy conf) and truncate to
    microseconds — integer `div`, NOT double division: epoch-nanos
    (~1.7e18) exceeds double's 53-bit exact range, so float division
    would corrupt timestamps by ±1µs. DuckDB also truncates ns→µs, so
    the oracle sees identical values."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Force events.ts to TIMESTAMP (LTZ). Depending on the fixture's
    parquet logical type and Spark's NTZ inference
    (spark.sql.parquet.inferTimestampNTZ.enabled, on by default in 4.x),
    the column can load as TIMESTAMP_NTZ — which batch window()/groupBy
    accept but `withWatermark` rejects outright
    ([EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]). The cast is value-exact
    because the session timezone is pinned to UTC (session.py), and LTZ
    is the dtype every watermark/stream path was built and verified
    against."""
    from pyspark.sql import functions as F

    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet path (file or directory),
    with the same NANOS→micros handling as the batch reader so batch and
    streaming plans see an identical schema. ``max_files_per_trigger``
    splits a bounded replay into multiple micro-batches (used by tests to
    exercise watermarks and cross-batch state)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_ts(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Register fixture tables as temp views (for the SQL API). ``only``
    restricts to the tables a query actually references — view
    registration is driver-side plan construction, and building all 10
    when a query joins 3 is pure per-call overhead."""
    names = TABLE_NAMES if only is None else only
    dfs = {name: load_table(spark, sf_dir, name) for name in names}
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
