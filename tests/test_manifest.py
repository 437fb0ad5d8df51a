"""Manifest-committed publish contract (sinks/manifest.py): commit-last
visibility, stray-file invisibility, loud failure on uncommitted or
corrupted directories, and footer-count validation."""

from __future__ import annotations

import json
import os

import pytest

from tp1_distribuidos_mapreduce_spark.sinks import manifest as MF

from conftest import SF_SMOKE


@pytest.fixture()
def published(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    path = str(tmp_path / "pub")
    m = MF.write_published(df, path)
    return df, path, m


def test_write_then_read_round_trips(spark, published):
    df, path, m = published
    assert m["total_rows"] == df.count()
    assert os.path.exists(os.path.join(path, MF.MANIFEST_NAME))
    back = MF.read_published(spark, path, validate_counts=True)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)


def test_stray_files_are_invisible(spark, published, tmp_path):
    df, path, m = published
    # A failed/crashed writer leaves an unmanifested part-file inside the
    # live snapshot dir; a directory-listing read would double-count, the
    # manifested read must not see it.
    df.limit(3).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    stray = next(
        n for n in os.listdir(str(tmp_path / "stray")) if n.endswith(".parquet")
    )
    snap_dir = os.path.join(path, m["snapshot"])
    os.rename(
        os.path.join(str(tmp_path / "stray"), stray),
        os.path.join(snap_dir, "part-stray-from-failed-writer.parquet"),
    )
    assert MF.read_published(spark, path).count() == df.count()
    # the naive directory-listing read double-counts
    assert spark.read.parquet(snap_dir).count() == df.count() + 3


def test_republish_swaps_atomically_and_vacuum(spark, published):
    df, path, m1 = published
    # Re-publish a different dataset: the old snapshot stays on disk (a
    # reader mid-scan of it must not break) until an explicit vacuum.
    m2 = MF.write_published(df.limit(5), path)
    assert m2["snapshot"] != m1["snapshot"]
    assert MF.read_published(spark, path, validate_counts=True).count() == 5
    assert os.path.isdir(os.path.join(path, m1["snapshot"]))
    removed = MF.vacuum_published(path)
    assert removed == [m1["snapshot"]]
    assert not os.path.isdir(os.path.join(path, m1["snapshot"]))
    assert MF.read_published(spark, path, validate_counts=True).count() == 5


def test_missing_manifest_is_loud(spark, published):
    _, path, _ = published
    os.remove(os.path.join(path, MF.MANIFEST_NAME))
    with pytest.raises(FileNotFoundError, match="never committed"):
        MF.read_published(spark, path)


def test_missing_listed_file_is_loud(spark, published):
    _, path, m = published
    os.remove(os.path.join(path, m["files"][0]["name"]))
    with pytest.raises(FileNotFoundError, match="corrupt"):
        MF.read_published(spark, path)


def test_count_validation_catches_swapped_file(spark, published):
    df, path, m = published
    # Overwrite a listed file with one holding a different row count.
    victim = m["files"][0]["name"]
    mpath = os.path.join(path, MF.MANIFEST_NAME)
    with open(mpath) as fh:
        manifest = json.load(fh)
    manifest["files"][0]["rows"] += 1
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    with pytest.raises(ValueError, match="footer rows"):
        MF.read_published(spark, path, validate_counts=True)
    assert victim  # unchanged on disk; only the manifest was tampered
