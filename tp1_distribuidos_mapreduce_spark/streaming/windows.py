"""Windowed aggregations over event streams.

Every transform here takes a DataFrame that may be EITHER batch
(``spark.read.parquet``) or streaming (``spark.readStream``) — the point of
Structured Streaming's unified model is that the same logical plan runs in
both modes, with watermarks only becoming operative under a streaming
query. The registry runs these in batch mode against the DuckDB oracle;
tests/test_streaming.py replays the same transforms through a file-source
stream with an availableNow trigger and asserts batch/stream agreement.

Scale notes:
- Tumbling/sliding windows are hash aggregations keyed on (window, key):
  partial aggregation happens map-side, state per key is O(1), and the
  shuffle carries only per-window partials — safe at any event rate.
- Sliding windows multiply state by window/slide (here 2×); Spark expands
  each event into its covering windows before the aggregate.
- Session windows keep per-key open-session state; the watermark bounds
  how long a session can stay open, which is what makes state finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_counts(
    events: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """Per-(hour, event_type) counts and value sums — the canonical
    tumbling-window aggregate. ``watermark`` activates late-data drop when
    the input is a stream; in batch mode it is a no-op by design."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact 1e-3-scaled BIGINT sum (value carries exactly 3
            # decimals): lossless at the 4dp grain, order-independent.
            (
                F.sum(F.round(F.col("value") * 1000).cast("long")) / 1000.0
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(round("value" * 1000) AS BIGINT)) / 1000.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


def sliding_event_stats(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window (1h window every 30m) per-type event stats. Each
    event contributes to width/slide windows; Spark expands the windows
    map-side so the aggregate still does partial+final combine."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        # exact 1e-3-scaled BIGINT sum + half-up integer division at 4dp
        # (round(avg) over floats flakes at rounding-boundary ties); the
        # avg() denominator is the non-null value count.
        .agg(
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sv"),
            F.count("value").alias("nv"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.expr("(20 * sv + nv) div (2 * nv)") / 10000.0).alias("avg_value"),
        )
    )


# Each event belongs to exactly 2 windows: the one starting at its 30-min
# bucket and the one starting 30 min earlier.
SLIDING_ORACLE = """
SELECT ws AS window_start,
       event_type,
       count(*) AS n_events,
       ((20 * sum(CAST(round("value" * 1000) AS BIGINT)) + count("value"))
        // (2 * count("value"))) / 10000.0 AS avg_value
FROM (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
         event_type, "value"
  FROM events
)
GROUP BY 1, 2
"""


def session_window_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap — the
    native ``session_window`` operator (dynamic, data-driven window
    boundaries; merges as events arrive under a streaming query)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            # exact 1e-3-scaled BIGINT sum (value carries exactly 3
            # decimals): lossless at the 4dp grain, order-independent.
            (
                F.sum(F.round(F.col("value") * 1000).cast("long")) / 1000.0
            ).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# Gaps-and-islands: a new session starts when the gap from the previous
# event is >= 30 min (session_window extends [ts, ts+gap), so an event
# exactly at prev+gap is NOT merged). session_end = last event + gap.
SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, "value",
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '30 minutes' OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL '30 minutes' AS session_end,
       count(*) AS n_events,
       sum(CAST(round("value" * 1000) AS BIGINT)) / 1000.0 AS sum_value
FROM numbered
GROUP BY user_id, session_no
"""
