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


def stream_static_enrichment(
    events: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Stream-static dimension enrichment: per-nation, per-type activity
    of the event stream, with the user→nation mapping joined in from
    STATIC dimension tables.

    The third join pattern alongside stream-stream (above) and batch:
    the static side needs no watermark and holds NO streaming state —
    Spark re-plans it as a broadcast per micro-batch, so the stream is
    enriched map-side at any scale (the dimension is customer-cardinality
    but the broadcast is built once per batch, and a slowly-changing
    dimension picks up updates on the next micro-batch re-read). The
    registry runs the identical plan in batch mode against a DuckDB
    oracle; tests/test_streaming.py replays it as a stream and pins
    agreement.
    """
    dim = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("c_custkey").alias("user_id"), F.col("n_name").alias("nation")
    )
    enriched = events.join(F.broadcast(dim), "user_id")
    out = enriched.groupBy("nation", "event_type").agg(
        F.count("*").alias("n_events"),
        # exact 1e-3-scaled BIGINT sum, half-up integer round to 2dp —
        # a 3dp-true sum ties at the half-cent for ~1 in 10 groups, and
        # a float sum resolves the tie by partial order.
        (
            F.expr(
                "(sum(cast(round(value * 1000) as bigint)) + 5) div 10"
            )
            / 100.0
        ).alias("total_value"),
    )
    # global sort is illegal on an unbounded stream; batch keeps it for
    # the deterministic oracle comparison.
    return out if out.isStreaming else out.orderBy("nation", "event_type")


STREAM_STATIC_ENRICHMENT_ORACLE = """
SELECT n.n_name AS nation,
       e.event_type,
       count(*) AS n_events,
       ((sum(CAST(round(e.value * 1000) AS BIGINT)) + 5) // 10) / 100.0
         AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name, e.event_type
ORDER BY nation, event_type
"""
