"""Approximate (sketch) aggregates: HyperLogLog distinct counts and
approximate quantiles.

At 100 TB exact COUNT(DISTINCT) and exact percentiles are shuffle-heavy
(all distinct values / all rows must meet); the sketch versions are
single-pass, mergeable, fixed-size state — the interactive-analytics path.
Sketch outputs are engine-specific (no DuckDB oracle; driver rows-only
check); tests/test_approx.py pins relative error against the exact
aggregates instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_user_counts(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Per-event-type approx distinct users (HyperLogLog++, target relative
    standard deviation ``rsd``) next to the event count."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        )
        .orderBy("event_type")
    )


def approx_price_quantiles(orders: DataFrame, accuracy: int = 10000) -> DataFrame:
    """Approximate median/p90/p99 of order price per priority
    (Greenwald-Khanna sketch with the given accuracy)."""
    q = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), accuracy
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.element_at(q, 1), 2).alias("ap50"),
            F.round(F.element_at(q, 2), 2).alias("ap90"),
            F.round(F.element_at(q, 3), 2).alias("ap99"),
        )
        .orderBy("o_orderpriority")
    )


def bitmap_distinct_users(events: DataFrame) -> DataFrame:
    """EXACT distinct users per event type via bitmap aggregation — the
    shuffle-light exact-distinct technique for dense integer keys.

    Phase 1 (map-side heavy): group by (type, bitmap bucket) and OR each
    user's bit into a fixed 4KB bitmap — the shuffle carries one bitmap
    per (type, bucket), not one row per event or per user. Phase 2 sums
    popcounts. Versus COUNT(DISTINCT), which expands to a two-shuffle
    distinct-then-count over raw ids, this moves orders of magnitude fewer
    bytes when ids are dense; versus HLL it is exact. The standard bitmap
    pattern Spark exposes as bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count.

    Exactness domain: (bitmap_bucket_number, bitmap_bit_position) is
    injective over the whole bigint range including zero and negatives
    (verified: 140001 consecutive ids straddling 0 → 140001 distinct
    (bucket, pos) pairs; e.g. 0→(0,0), -1→(0,1), 1→(1,0)), so the popcount
    sum counts every distinct id exactly once whatever the sign. NULLs are
    dropped explicitly to mirror COUNT(DISTINCT)'s implicit null-ignore.
    """
    events = events.where(F.col("user_id").isNotNull())
    buckets = events.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id"))).alias("bm")
    )
    return (
        buckets.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users"))
        .orderBy("event_type")
    )


BITMAP_DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
"""
