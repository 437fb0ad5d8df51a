"""Date-partitioned layout contracts (sinks/partitioned.py): partition
pruning from the scan's actual input files, and dynamic-overwrite
restatement that provably never touches other partitions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.sinks.partitioned import (
    PRUNE_DATE,
    ensure_partitioned_events,
    overwrite_partitions,
    write_partitioned,
)

from conftest import SF_SMOKE


def test_partition_pruned_read_lists_single_directory(spark):
    path = ensure_partitioned_events(spark, SF_SMOKE)
    pruned = spark.read.parquet(path).where(F.col("event_date") == F.lit(PRUNE_DATE))
    # inputFiles() reports the unpruned relation; the files the executed
    # scan actually reads are what partition pruning is about.
    files = [
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "pruned scan found no files"
    assert all(f"event_date={PRUNE_DATE}" in f for f in files), files
    # the full table has ~30 day directories; the pruned scan reads one
    all_files = spark.read.parquet(path).inputFiles()
    assert len(files) < len(all_files)
    # and the plan itself carries the partition filter (plan-time pruning,
    # not a post-scan filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def _file_snapshot(root: str) -> dict[str, int]:
    out = {}
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[p] = os.path.getsize(p)
    return out


def test_dynamic_overwrite_restates_only_written_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
        "id bigint, v string, d string",
    )
    write_partitioned(df, path, ["d"])
    before = {
        p: s for p, s in _file_snapshot(path).items() if "d=d1" in p
    }
    assert before, "expected files in the untouched partition"

    restated = spark.createDataFrame(
        [(9, "Z", "d2")], "id bigint, v string, d string"
    )
    overwrite_partitions(restated, path, ["d"])

    after = {p: s for p, s in _file_snapshot(path).items() if "d=d1" in p}
    assert after == before, "untouched partition files changed"
    rows = {
        (r["id"], r["v"], r["d"]) for r in spark.read.parquet(path).collect()
    }
    assert rows == {(1, "a", "d1"), (2, "b", "d1"), (9, "Z", "d2")}


def test_static_overwrite_would_have_truncated(spark, tmp_path):
    """The failure dynamic mode prevents: a plain overwrite of the same
    frame drops every partition not present in it."""
    path = str(tmp_path / "t2")
    df = spark.createDataFrame(
        [(1, "a", "d1"), (3, "c", "d2")], "id bigint, v string, d string"
    )
    write_partitioned(df, path, ["d"])
    write_partitioned(
        spark.createDataFrame([(9, "Z", "d2")], "id bigint, v string, d string"),
        path,
        ["d"],
    )
    assert {r["d"] for r in spark.read.parquet(path).collect()} == {"d2"}
