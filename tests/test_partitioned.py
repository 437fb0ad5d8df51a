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


def test_stream_restatement_last_writer_wins_per_partition(spark, tmp_path):
    """streaming/sinks.py write_stream_restatement: two micro-batches with
    an overlapping partition — the later batch's version of the day must
    fully replace the earlier one's, while untouched days persist."""
    import time

    from tp1_distribuidos_mapreduce_spark.streaming.sinks import (
        write_stream_restatement,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: day1 v1 + day2 v1; batch 2 (newer mtime): day2 v2 restated
    spark.createDataFrame(
        [(1, "v1", "d1"), (2, "v1", "d2")], "id bigint, v string, d string"
    ).coalesce(1).write.json(str(src / "f1"))
    time.sleep(1.1)  # file-source orders by mtime; make batch 2 strictly newer
    spark.createDataFrame(
        [(9, "v2", "d2")], "id bigint, v string, d string"
    ).coalesce(1).write.json(str(src / "f2"))

    stream = (
        spark.readStream.schema("id bigint, v string, d string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    write_stream_restatement(stream, out, ckpt, ["d"])

    rows = {(r["id"], r["v"], r["d"]) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, "v1", "d1"), (9, "v2", "d2")}, rows
