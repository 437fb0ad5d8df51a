"""Skew-mitigation utilities: salted joins and salted two-phase aggregation.

AQE's skew-join splitting covers sort-merge joins at runtime, but two
shapes still need explicit salting at 100 TB:

- joins where one side's hot key would overwhelm a single task and AQE
  can't split (e.g. the build side of a shuffled hash join, or stateful
  streaming joins);
- non-algebraic aggregations (collect_set/collect_list) on hot keys, where
  Spark's partial aggregation can't shrink the hot key's payload below
  one-task granularity.

The reference hash-partitions by raw key with R=2 and has no skew story at
all (cmd/worker/worker.go:75-79: fnv(key) % R); these utilities are the
scale-path replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(df: DataFrame, num_salts: int) -> Column:
    """Per-row salt: hash of the whole row PLUS a per-row monotonic id,
    mod num_salts. Any distribution works for correctness; the monotonic
    id matters because a hot key whose rows are byte-identical across
    every column (a projected join key, duplicated events) would
    otherwise hash to ONE salt and land on a single task — silently
    defeating the very mitigation this function exists for."""
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), *[F.col(c) for c in df.columns]),
        F.lit(num_salts),
    ).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot join keys are spread over
    ``num_salts`` sub-keys and ``small`` is replicated once per salt —
    each hot key's rows land on ``num_salts`` tasks instead of one.
    Output columns = big's columns + small's non-key columns.

    Only joins that preserve the replicated side's multiplicity are
    legal: under right/full outer joins each of the ``num_salts`` small-
    side replicas without a matching (key, salt) row would emit its own
    null-padded output row — duplicated and spurious rows, silently.
    """
    safe = {"inner", "left", "left_outer", "leftouter", "cross",
            "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate the replicated "
            "small side's unmatched rows once per salt; only "
            "inner/left/semi/anti joins are supported"
        )
    big_s = big.withColumn("__salt", _salt_of(big, num_salts))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    joined = big_s.join(small_s, [on, "__salt"], how)
    return joined.drop("__salt")


def salted_collect_set(
    df: DataFrame, key: str, value: str, num_salts: int = 8
) -> DataFrame:
    """collect_set(value) per key in two phases: (key, salt) partial sets
    shrink the hot key's shuffle payload to per-salt distinct values, then
    a cheap final merge of ≤ num_salts pre-deduped arrays per key.

    Returns (key, values array<...> sorted distinct)."""
    partial = (
        df.withColumn("__salt", _salt_of(df, num_salts))
        .groupBy(key, "__salt")
        .agg(F.collect_set(value).alias("__vs"))
    )
    return (
        partial.groupBy(key)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__vs")))
            ).alias("values")
        )
    )
