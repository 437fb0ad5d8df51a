"""Stream-stream interval join: click→purchase attribution.

Two streams of the same events source, joined per user within a time
bound. Under a streaming query both sides carry watermarks and the range
condition bounds the join state Spark must keep (clicks older than
watermark + max_gap are evicted); in batch mode the identical plan is a
plain range join. The registry runs the batch semantics against a DuckDB
oracle; tests/test_streaming.py replays it stream-stream and pins
agreement with the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    events: DataFrame, max_gap: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Pairs (click_id, purchase_id) where the purchase follows a click by
    the same user within ``max_gap``. One row per qualifying pair."""
    clicks = events.where(F.col("event_type") == "click")
    purchases = events.where(F.col("event_type") == "purchase")
    if watermark is not None:
        clicks = clicks.withWatermark("ts", watermark)
        purchases = purchases.withWatermark("ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    out = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
    ).select("click_id", "purchase_id")
    # global sort is illegal on an unbounded stream (append mode); the
    # batch path keeps it for deterministic oracle comparison.
    return out if out.isStreaming else out.orderBy("click_id", "purchase_id")


ATTRIBUTION_ORACLE = """
SELECT c.event_id AS click_id, p.event_id AS purchase_id
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
ORDER BY click_id, purchase_id
"""
