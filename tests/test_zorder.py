"""Z-order layout tests: correctness (pure physical — same rows back) and
the deterministic read-pruning A/B that motivates the layout.

The A/B compares parquet row-group min/max pruning — counted from footer
metadata, the exact statistics Spark's reader prunes with — instead of
wall-clock, because the documented machine noise band (±45% per query,
VERDICT r6) would swallow any timing delta at fixture scale, while the
row-group counts are bit-deterministic for a given layout.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tp1_distribuidos_mapreduce_spark.sinks.zorder import (
    column_bounds,
    rowgroups_overlapping,
    write_zordered,
    zorder_expr,
)

from conftest import SF_SMOKE

N_FILES = 32


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """events written two ways: linear sort by user_id (the classic
    single-column clustering) vs z-order over (user_id, value)."""
    d = tmp_path_factory.mktemp("zorder")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    linear = str(d / "linear")
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(linear)
    )
    zordered = str(d / "zordered")
    write_zordered(ev, zordered, ("user_id", "value"), num_files=N_FILES)
    return ev, linear, zordered


def test_zorder_is_pure_physical_layout(spark, layouts):
    ev, _, zordered = layouts
    back = spark.read.parquet(zordered)
    assert back.schema == ev.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_zorder_prunes_non_lead_dimension(spark, layouts):
    """The motivating A/B: a range filter on the SECOND dimension. The
    linear layout clusters user_id only, so every file spans the full
    value domain and nothing prunes; the z-ordered layout must let the
    same filter skip a majority of row groups."""
    ev, linear, zordered = layouts
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).collect()[0]
    span = b.hi - b.lo
    pred = {"value": (b.lo + 0.40 * span, b.lo + 0.50 * span)}  # 10% slab

    lin_hit, lin_total = rowgroups_overlapping(linear, pred)
    z_hit, z_total = rowgroups_overlapping(zordered, pred)
    # linear-by-user_id layout cannot prune a value filter at all
    assert lin_hit == lin_total
    # z-order must skip most of the data for a 10% slab (8-bit buckets,
    # 32 files ⇒ each file covers ~1/32 of the curve; a 10%-of-domain
    # slab in one dimension touches well under half the files)
    assert z_hit < z_total / 2, f"z-order pruned only {z_total - z_hit}/{z_total}"
    assert z_hit < lin_hit


def test_zorder_still_prunes_lead_dimension(spark, layouts):
    """Price of admission: z-order trades perfect lead-column clustering
    for good clustering on every column. A 10% user_id slab must still
    skip a majority of row groups (it cannot match linear's near-perfect
    pruning, but must be nowhere near a full scan)."""
    ev, linear, zordered = layouts
    b = ev.agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi")).collect()[0]
    span = b.hi - b.lo
    pred = {"user_id": (b.lo + 0.40 * span, b.lo + 0.50 * span)}

    lin_hit, lin_total = rowgroups_overlapping(linear, pred)
    z_hit, z_total = rowgroups_overlapping(zordered, pred)
    assert lin_hit <= max(2, lin_total // 8)  # linear: near-perfect
    assert z_hit < z_total / 2, f"z-order pruned only {z_total - z_hit}/{z_total}"


def test_zorder_expr_interleaves_bits(spark):
    """Morton value spot-check on a constructed frame: with 2-bit buckets
    over [0, 3]×[0, 3], z(x, y) must interleave x into even bits and y
    into odd bits — the textbook curve order."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    bounds = column_bounds(df, ("x", "y"))
    assert bounds == {"x": (0.0, 3.0), "y": (0.0, 3.0)}
    out = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_expr(df, ("x", "y"), bounds, bits=2)
        ).collect()
    }

    def morton(x, y):
        return (
            (x & 1)
            | ((y & 1) << 1)
            | (((x >> 1) & 1) << 2)
            | (((y >> 1) & 1) << 3)
        )

    assert out == {(x, y): morton(x, y) for x in range(4) for y in range(4)}
