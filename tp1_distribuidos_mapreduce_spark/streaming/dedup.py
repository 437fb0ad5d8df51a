"""Streaming deduplication: exactly-once record semantics over
at-least-once delivery.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; an ingest pipeline sees the same record again whenever an upstream
producer retries, a file lands twice, or a backfill replays a shard. The
unified-model transform here runs in both modes:

- streaming: ``dropDuplicatesWithinWatermark`` keyed on the record id —
  per-key state is retained only until the watermark passes the record's
  event time, which is what keeps state FINITE at unbounded input (a plain
  ``dropDuplicates`` on a stream would accumulate every id ever seen).
- batch: plain ``dropDuplicates`` on the same key — identical semantics
  when the whole input is visible at once (the registry's oracle-checked
  path).

Scale notes: dedup state is hash-partitioned by id across executors; the
watermark horizon bounds per-partition state at (event rate × horizon),
independent of total stream length. Duplicates separated by more than the
horizon are out of contract by design — the same contract Kafka/Delta
idempotent sinks offer — and belong to the batch near-dup pass instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame, key: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Drop duplicate events by id; works on batch and streaming inputs.

    ``events`` must carry an event-time ``ts`` column; in streaming mode
    the watermark on ts bounds dedup state retention.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            [key]
        )
    return events.dropDuplicates([key])


def deduped_event_type_counts(events: DataFrame) -> DataFrame:
    """Counts per event_type after dedup — the registry-facing shape.

    Dedups on (event_id, event_type), not event_id alone: if the same id
    ever arrived with two different types (producer-side mutation under
    at-least-once delivery), an id-only dropDuplicates would keep an
    ARBITRARY survivor and make per-type counts nondeterministic across
    runs. The pair key keeps the count a pure function of the input set —
    and matches the oracle's SELECT DISTINCT event_id, event_type exactly.
    """
    from pyspark.sql import functions as F

    return (
        events.dropDuplicates(["event_id", "event_type"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type")
    )
