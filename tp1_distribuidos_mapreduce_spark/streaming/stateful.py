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
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 4)]}
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
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id")
    )


USER_TOTALS_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum("value"), 4) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""
