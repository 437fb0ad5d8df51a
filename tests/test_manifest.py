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
    df, path, _ = published
    # A failed concurrent writer leaves an unmanifested part-file; a
    # directory-listing read would double-count, the manifested read must
    # not see it.
    df.limit(3).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    stray = next(
        n for n in os.listdir(str(tmp_path / "stray")) if n.endswith(".parquet")
    )
    os.rename(
        os.path.join(str(tmp_path / "stray"), stray),
        os.path.join(path, "part-stray-from-failed-writer.parquet"),
    )
    assert MF.read_published(spark, path).count() == df.count()
    assert spark.read.parquet(path).count() == df.count() + 3  # the naive read


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
