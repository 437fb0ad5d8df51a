"""SQL front-end surface: queries authored as ANSI SQL text and executed
via ``spark.sql`` over the registered fixture views.

The same SQL string doubles as its own DuckDB oracle — one text, two
engines — which pins Spark's SQL parser/analyzer surface (joins, CTEs,
window functions, DISTINCT aggregates) rather than just the DataFrame API.
The reference has no query language at all (a query is a compiled Go
plugin, SURVEY.md §3); this is the declarative replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

REVENUE_BY_REGION_SQL = """
SELECT r_name,
       count(DISTINCT c_custkey) AS n_customers,
       -- exact integer cents: a float sum's partial-order wobble can
       -- cross the half-cent rounding boundary differently per engine
       -- CAST to DOUBLE before /100.0: in Spark SQL text the literal is
       -- DECIMAL(4,1) and BIGINT/DECIMAL yields DECIMAL (dtype mismatch)
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
GROUP BY r_name
ORDER BY r_name
"""

TOP_BALANCES_SQL = """
WITH ranked AS (
  SELECT n_name, c_name, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rk
  FROM customer
  JOIN nation ON n_nationkey = c_nationkey
)
SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal, CAST(rk AS INTEGER) AS rk
FROM ranked
WHERE rk <= 3
ORDER BY n_name, rk
"""


GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       -- exact integer cents (same one-text-two-engines tie-proofing)
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY returnflag, linestatus
"""


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register only the fixture views the SQL text references, then run
    it. The table set is DERIVED from the text (word-boundary scan over
    the known fixture names) rather than hand-listed per query: a
    hand-maintained tuple goes stale the moment a query gains a join, and
    the resulting missing-view error would hide in any test session where
    an earlier query already registered the view. A false positive (a
    table name appearing only in a comment) merely registers one unused
    view — driver-side, harmless."""
    import re

    from ..sources.tables import TABLE_NAMES

    # IGNORECASE: SQL identifiers are case-insensitive, so FROM ORDERS or
    # "Orders" must register the view too; table names are plain words, so
    # this adds no false-negative risk (ADVICE r3).
    referenced = tuple(
        t for t in TABLE_NAMES if re.search(rf"\b{t}\b", sql, re.IGNORECASE)
    )
    register_views(spark, sf_dir, only=referenced)
    return spark.sql(sql)
