"""MERGE / upsert: apply a CDC-style change batch (updates + inserts) to a
target table as one co-partitioned full-outer join.

Additive scale surface (the reference has no mutation concept — its
datasets are immutable text directories, SURVEY.md §1.2). This is the
lake-engine MERGE INTO shape expressed in pure DataFrame ops — what
Delta/Iceberg execute under copy-on-write, minus the file-level pruning
their logs add.

The naive formulation is a full-outer join with source-wins coalescing,
but Spark cannot broadcast a full-outer join, so the 100 TB target would
shuffle on every merge no matter how small the change batch. The
decomposition used here — anti-join the target against the source keys,
then union the source — is row-equivalent (given unique source keys, the
standard MERGE precondition) and broadcast-friendly: a ≪-target change
batch rides along as a broadcast LeftAnti and the whole merge is one
map-only pass over the target scan plus a union. If the batch outgrows
broadcast, the anti-join degrades gracefully to a shuffle on the merge
key, where a key-bucketed target (sinks/bucketed.py) drops the
target-side Exchange; skewed merge keys fall back to AQE's skew split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """SQL ``MERGE INTO target USING source ON key``: matched rows take
    every source column, unmatched target rows persist, unmatched source
    rows insert. Source must share the target's schema and carry unique
    keys (real MERGE raises on ambiguous source matches for the same
    reason).

    NULL semantics caveat for oracle authors: a matched row takes the
    source value EVEN WHEN NULL (real MERGE), but the companion
    MERGE_UPSERT_ORDERS_ORACLE mirrors this with coalesce(s.col, t.col),
    which would resurrect the target value instead. The two agree today
    only because the derived change batch carries no NULLs — a new query
    reusing this helper with a NULL-bearing source must write its oracle
    with CASE WHEN s.key IS NOT NULL THEN s.col, not coalesce.
    """
    # No explicit broadcast hint: Catalyst/AQE picks broadcast when the
    # batch is small and falls back to a key shuffle when it isn't —
    # hinting would pin the small-batch plan onto arbitrarily large ones.
    survivors = target.join(source.select(key), key, "left_anti")
    return survivors.unionByName(source.select(*target.columns))


def _bumped_price() -> F.Column:
    """Price +5% in integer cents, half-up — identical integer arithmetic
    in Spark and DuckDB, so the differential is exact where a double
    ``round(x * 1.05, 2)`` could straddle engine rounding on boundary
    doubles. (Built lazily: Column construction needs an active session.)
    """
    return (
        F.floor(
            (F.round(F.col("o_totalprice") * 100).cast("long") * 105 + F.lit(50)) / 100
        ).cast("long")
        / F.lit(100.0)
    )


def merge_upsert_orders(orders: DataFrame) -> DataFrame:
    """Apply a deterministic change batch to ``orders`` and summarize the
    merged table per status: every 10th order is updated (status 'U',
    price +5% half-up at cent precision), every 97th is re-inserted under
    a fresh key as status 'N'. Final sums run in scaled-cents BIGINTs
    (corpus_curation's flake-proof pattern) divided once at the end.
    """
    upd = (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", _bumped_price())
    )
    ins = (
        orders.where(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    merged = merge_upsert(orders, upd.unionByName(ins), "o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / F.lit(100.0)
            ).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


MERGE_UPSERT_ORDERS_ORACLE = """
WITH upd AS (
  SELECT * REPLACE (
    'U' AS o_orderstatus,
    floor((CAST(round(o_totalprice * 100) AS BIGINT) * 105 + 50) / 100) / 100.0
      AS o_totalprice)
  FROM orders WHERE o_orderkey % 10 = 0
), ins AS (
  SELECT * REPLACE (o_orderkey + 10000000 AS o_orderkey, 'N' AS o_orderstatus)
  FROM orders WHERE o_orderkey % 97 = 0
), src AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), merged AS (
  SELECT coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
         coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice
  FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS sum_price
FROM merged
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
