"""Manifest-committed parquet publish — the atomic-visibility contract a
multi-writer data lake needs without a table format.

A plain ``df.write.parquet(path)`` is only atomic per file: a concurrent
or crashed writer leaves stray part-files that a naive directory-listing
reader happily ingests (double counts), and a partially-deleted output
silently under-counts. Table formats (Iceberg/Delta) fix this with a
committed file list; this sink implements the same discipline at parquet
level, in the spirit of Spark's own ``_SUCCESS`` marker but carrying
enough metadata to VALIDATE, not just signal:

- ``write_published`` writes the data, then commits ``_MANIFEST.json``
  recording every data file with its parquet-footer row count and byte
  size, plus the total and the schema. The manifest is written LAST —
  readers that require it therefore never observe a partial write
  (rename-free object stores included: the manifest PUT is the commit
  point).
- ``read_published`` reads ONLY the manifested files (stray part-files
  from failed/concurrent writers are invisible), fails loudly when the
  manifest is missing (uncommitted directory) or a listed file is gone
  (corrupted publish), and optionally re-validates row counts against
  the footers.

Driver-side work is bounded by the file COUNT (one footer read each —
metadata pages, not data), never by rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_MANIFEST.json"


def write_published(df: DataFrame, path: str) -> dict:
    """Write ``df`` as parquet under ``path`` and commit a manifest.
    Returns the manifest dict."""
    import pyarrow.parquet as pq

    df.write.mode("overwrite").parquet(path)
    files = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        meta = pq.ParquetFile(full).metadata
        files.append(
            {"name": name, "rows": meta.num_rows, "bytes": os.path.getsize(full)}
        )
    manifest = {
        "files": files,
        "total_rows": sum(f["rows"] for f in files),
        "schema": df.schema.simpleString(),
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    # rename is the commit point on POSIX; on an object store the final
    # PUT of the manifest object plays the same role.
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def read_published(
    spark: SparkSession, path: str, validate_counts: bool = False
) -> DataFrame:
    """Read a manifest-committed directory: only listed files, loud
    failure on a missing manifest or missing listed file."""
    import pyarrow.parquet as pq

    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{mpath} not found: directory was never committed "
            "(write_published writes the manifest last — a missing manifest "
            "means a partial or foreign write; refusing to guess)"
        )
    with open(mpath) as fh:
        manifest = json.load(fh)
    listed = [os.path.join(path, f["name"]) for f in manifest["files"]]
    missing = [p for p in listed if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"manifest lists {len(missing)} file(s) that no longer exist "
            f"(first: {missing[0]}): the publish is corrupt"
        )
    if validate_counts:
        for f in manifest["files"]:
            actual = pq.ParquetFile(os.path.join(path, f["name"])).metadata.num_rows
            if actual != f["rows"]:
                raise ValueError(
                    f"{f['name']}: footer rows {actual} != manifest {f['rows']}"
                )
    return spark.read.parquet(*listed)
