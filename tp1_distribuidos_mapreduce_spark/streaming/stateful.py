"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all; this is the engine's surface for
user-defined per-key state machines (the streaming analogue of the O12
plugin contract, seq/sequential.go:14-15 — arbitrary user logic per key,
but over an unbounded keyed stream instead of a grouped batch).

``running_user_totals`` keeps (n_events, sum_value) per user and emits the
updated running totals for every key touched by each micro-batch. After a
full replay of a bounded input, the LAST emission per key equals the batch
``groupBy(user).agg(count, sum)`` — the invariant tests/test_streaming.py
pins. State is a fixed-width tuple per user — O(distinct keys) executor
memory, the same bound Spark's own streaming aggregation carries.

Spark 4's successor API, ``transformWithStateInPandas`` (typed state
variables, timers, TTL), is ENV-BLOCKED here — verified empirically, not
assumed: the StatefulProcessor API imports and the RocksDB provider conf
sets, but the TransformWithStateInPySpark driver worker crashes at init
with ``ImportError: cannot import name 'descriptor' from
'google.protobuf'`` (its runner protocol needs protobuf, absent in this
container, and installs are disallowed). ``applyInPandasWithState``
carries the same per-key state-machine contract without that dependency;
migrating these operators to TWS is mechanical once protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
# total is 1e-3-scaled integer millis (value carries exactly 3 decimals):
# an exact, arrival-order-independent accumulator — float accumulation
# would make the emitted running total depend on micro-batch boundaries.
STATE_SCHEMA = "n long, total long"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int(pdf["value"].mul(1000).round().sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [total / 1000.0]}
    )


def running_user_totals(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Streaming: per-user running (count, sum) state machine. Works only
    under a streaming query (update output mode)."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_event_totals(events: DataFrame) -> DataFrame:
    """Batch semantic of the same computation — what the streaming state
    converges to after a complete replay."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            # same exact 1e-3-scaled integer sum as the streaming state.
            (
                F.sum(F.round(F.col("value") * 1000).cast("long")) / 1000.0
            ).alias("sum_value"),
        )
        .orderBy("user_id")
    )


USER_TOTALS_ORACLE = """
SELECT user_id, count(*) AS n_events,
       sum(CAST(round("value" * 1000) AS BIGINT)) / 1000.0 AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


GAP_OUTPUT_SCHEMA = "user_id long, gap_start string, gap_end string, gap_s long"
GAP_STATE_SCHEMA = "last_ns long"


def streaming_gap_detection(
    events: DataFrame, min_gap_s: int = 86400, watermark: str | None = None
) -> DataFrame:
    """Streaming twin of plans/relational_ext.py's event_gap_detection:
    per-user inactivity gaps emitted AS THEY CLOSE, instead of after a full
    batch scan.

    State per user is one long (the last-seen event timestamp in epoch ns)
    — O(distinct users) executor memory, the minimum any gap detector can
    carry. Each micro-batch sorts its rows per key by (ts, event_id) — the
    same total order the batch lag-window uses — compares against the
    carried last_ns, and emits one row per gap whose closing event arrived
    in this batch. After a complete in-order replay the union of emissions
    equals the batch query's rows exactly (pinned in
    tests/test_streaming.py); gaps are measured on second-truncated
    timestamps to match the batch unix_timestamp semantics.

    Correctness requires event-time-ordered arrival per key ACROSS batches
    (within a batch we sort). That is the standard contract for this state
    shape — reorder-tolerance would need a buffer-and-watermark state
    machine, which Spark's built-in session windows already provide
    (session_window_stats); this operator is the explicit last-value state
    machine the O12-style plugin surface promises.
    """

    def _detect(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last_ns = state.get[0] if state.exists else None
        out = {"user_id": [], "gap_start": [], "gap_end": [], "gap_s": []}
        batch = pd.concat(list(pdfs), ignore_index=True)
        # NaT guard: the batch twin's lag comparison silently drops
        # null-ts rows; without this filter NaT.value (-2^63) would enter
        # state and fabricate an astronomical gap on the next event.
        batch = batch[batch["ts"].notna()]
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        for ts in batch["ts"]:
            ts_ns = ts.value
            if last_ns is not None:
                gap_s = ts_ns // 1_000_000_000 - last_ns // 1_000_000_000
                if gap_s > min_gap_s:
                    out["user_id"].append(key[0])
                    out["gap_start"].append(str(pd.Timestamp(last_ns)))
                    out["gap_end"].append(str(pd.Timestamp(ts_ns)))
                    out["gap_s"].append(gap_s)
            last_ns = ts_ns
        if last_ns is not None:
            state.update((int(last_ns),))
        yield pd.DataFrame(out)

    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return events.groupBy("user_id").applyInPandasWithState(
        _detect,
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
