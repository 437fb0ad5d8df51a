"""Data profiling and quality gates — the Deequ/Great-Expectations-style
surface a warehouse team runs before trusting a table, expressed as pure
Catalyst plans with exact DuckDB oracles.

Three operators:

- ``table_profile``: one-pass per-column statistics of ``lineitem`` in
  long format (column, metric, value). The scale-critical property is
  ONE aggregate job over ONE scan for every column × metric — a naive
  profiler that loops columns re-scans the table per column, which at
  100 TB turns a profile into N full reads. The unpivot to long format
  happens on the single 1-row aggregate result, i.e. for free.
- ``data_quality_checks``: named constraint checks (PK uniqueness, FK
  integrity, range and domain rules) each evaluated as an aggregate and
  unioned into a (check, n_violations, passed) report. Single-table
  rules fold into one shared aggregate per table; the FK rule is an
  anti-join on the key — the honest distributed shape (shuffle on the
  FK; at 100 TB you would bloom-prefilter it exactly like
  ``plans/bloom.py`` does for joins).
- ``numeric_histogram``: 10-bin equi-width histogram of
  ``l_extendedprice``. min/max come from a 1-row aggregate broadcast
  back over the scan (two passes over one lineage, no collect); bin
  assignment is a map-side expression, so the histogram is a plain
  partial+final hash aggregate on ≤10 keys.

Float discipline (verify notes): every mean is computed from scaled-cent
BIGINT sums so partial-aggregation order can never perturb the rounded
result; mins/maxes/histogram edges are raw doubles on which both engines
perform the identical IEEE-754 expression, so the value-hash compare is
bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lineitem numeric columns profiled, with their cent-scale factor for
# exact means (quantity is integral-valued so scale 1 suffices, but the
# shared cent path keeps one discipline for all columns).
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

HISTOGRAM_BINS = 10


def table_profile(lineitem: DataFrame) -> DataFrame:
    """Long-format profile of lineitem's numeric columns.

    Output: (col_name, metric, value) for metrics n, n_null,
    n_distinct, min, max, mean — every cell from ONE aggregate over ONE
    scan (map-side partial aggregation does the heavy lifting; the
    exchange carries a single row per partition).
    """
    aggs = []
    for c in _PROFILE_COLS:
        cents = F.round(F.col(c) * 100).cast("long")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__n_null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__n_distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(cents).alias(f"{c}__cents"),
        ]
    one = lineitem.agg(*aggs)
    # Unpivot the 1-row aggregate with a stack() expression — executes on
    # a single row, no second scan. mean = cents / n / 100 rounded to 4,
    # identical rational → identical double in both engines.
    cells = []
    for c in _PROFILE_COLS:
        cells += [
            f"'{c}', 'n', CAST({c}__n AS DOUBLE)",
            f"'{c}', 'n_null', CAST({c}__n_null AS DOUBLE)",
            f"'{c}', 'n_distinct', CAST({c}__n_distinct AS DOUBLE)",
            f"'{c}', 'min', {c}__min",
            f"'{c}', 'max', {c}__max",
            f"'{c}', 'mean', round({c}__cents / {c}__n / 100.0, 4)",
        ]
    n_cells = len(cells)
    stacked = one.select(
        F.expr(
            f"stack({n_cells}, "
            + ", ".join(cells)
            + ") AS (col_name, metric, value)"
        )
    )
    return stacked.orderBy("col_name", "metric")


TABLE_PROFILE_ORACLE = (
    """
WITH one AS (
  SELECT
"""
    + ",\n".join(
        f"""    count(*) AS {c}__n,
    CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS {c}__n_null,
    CAST(count(DISTINCT {c}) AS BIGINT) AS {c}__n_distinct,
    min({c}) AS {c}__min,
    max({c}) AS {c}__max,
    CAST(sum(CAST(round({c} * 100) AS BIGINT)) AS BIGINT) AS {c}__cents"""
        for c in _PROFILE_COLS
    )
    + """
  FROM lineitem
)
"""
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS col_name, 'n' AS metric, CAST({c}__n AS DOUBLE) AS value FROM one
UNION ALL SELECT '{c}', 'n_null', CAST({c}__n_null AS DOUBLE) FROM one
UNION ALL SELECT '{c}', 'n_distinct', CAST({c}__n_distinct AS DOUBLE) FROM one
UNION ALL SELECT '{c}', 'min', {c}__min FROM one
UNION ALL SELECT '{c}', 'max', {c}__max FROM one
UNION ALL SELECT '{c}', 'mean', round({c}__cents / {c}__n / 100.0, 4) FROM one"""
        for c in _PROFILE_COLS
    )
    + "\nORDER BY col_name, metric"
)


def data_quality_checks(
    orders: DataFrame, lineitem: DataFrame, events: DataFrame
) -> DataFrame:
    """Constraint-check report: (check_name, n_violations, passed).

    Single-table rules share one aggregate per table (one scan each);
    the lineitem→orders FK rule is a left-anti join on the key. The
    ``events_value_le_300`` rule is a deliberately tight business bound
    so the report demonstrably carries non-zero violation counts.
    """
    orders_checks = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("orders_pk_unique"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias(
            "orders_totalprice_not_null"
        ),
    )
    lineitem_checks = lineitem.agg(
        F.sum(
            ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")
        ).alias("lineitem_qty_in_1_50"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long")
        ).alias("lineitem_discount_in_0_01"),
    )
    events_checks = events.agg(
        F.sum(
            (
                ~F.col("event_type").isin(
                    "view", "click", "purchase", "signup", "error"
                )
            ).cast("long")
        ).alias("events_type_domain"),
        F.sum((F.col("value") > 300.0).cast("long")).alias(
            "events_value_le_300"
        ),
    )
    fk_violations = (
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("lineitem_orderkey_fk"))
    )

    def unpivot(df: DataFrame) -> DataFrame:
        names = df.columns
        cells = ", ".join(f"'{n}', {n}" for n in names)
        return df.select(
            F.expr(f"stack({len(names)}, {cells}) AS (check_name, n_violations)")
        )

    report = (
        unpivot(orders_checks)
        .unionByName(unpivot(lineitem_checks))
        .unionByName(unpivot(events_checks))
        .unionByName(unpivot(fk_violations))
        .select(
            "check_name",
            "n_violations",
            (F.col("n_violations") == 0).cast("long").alias("passed"),
        )
        .orderBy("check_name")
    )
    return report


DATA_QUALITY_CHECKS_ORACLE = """
WITH checks AS (
  SELECT 'orders_pk_unique' AS check_name,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'orders_totalprice_not_null',
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem_qty_in_1_50',
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_in_0_01',
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'events_type_domain',
         CAST(sum(CASE WHEN event_type NOT IN
                  ('view','click','purchase','signup','error')
                  THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'events_value_le_300',
         CAST(sum(CASE WHEN value > 300.0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'lineitem_orderkey_fk',
         CAST(count(*) AS BIGINT)
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
)
SELECT check_name, n_violations,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM checks
ORDER BY check_name
"""


def numeric_histogram(lineitem: DataFrame, bins: int = HISTOGRAM_BINS) -> DataFrame:
    """Equi-width histogram of l_extendedprice: (bin, lo, hi, n_items).

    min/max come from a 1-row aggregate joined back by broadcast (two
    passes over one scan lineage, zero driver collects); bin assignment
    and edges are map-side doubles computed by the identical IEEE
    expression in both engines. The top edge clamps into the last bin.
    """
    stats = lineitem.agg(
        F.min("l_extendedprice").alias("lo_all"),
        F.max("l_extendedprice").alias("hi_all"),
    )
    with_bin = lineitem.select("l_extendedprice").join(F.broadcast(stats)).select(
        "l_extendedprice",
        "lo_all",
        "hi_all",
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo_all"))
                / ((F.col("hi_all") - F.col("lo_all")) / bins)
            ),
            F.lit(bins - 1),
        )
        .cast("long")
        .alias("bin"),
    )
    return (
        with_bin.groupBy("bin")
        # edges in EXACT integers: prices carry 2 decimals, so the true
        # edge lo + b·(hi−lo)/bins is the rational (bins·lo_c + b·Δ_c)
        # / (100·bins) — an odd Δ_c at the mid bin lands exactly on a
        # half-cent, where Spark's shortest-repr HALF_UP and DuckDB's
        # raw-double round diverge; half-up integer division cannot.
        .agg(
            F.round(F.first("lo_all") * 100).cast("long").alias("lo_c"),
            F.round(F.first("hi_all") * 100).cast("long").alias("hi_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "bin",
            (
                F.expr(
                    f"(2 * ({bins} * lo_c + bin * (hi_c - lo_c)) + {bins})"
                    f" div (2 * {bins})"
                )
                / 100.0
            ).alias("lo"),
            (
                F.expr(
                    f"(2 * ({bins} * lo_c + (bin + 1) * (hi_c - lo_c)) + {bins})"
                    f" div (2 * {bins})"
                )
                / 100.0
            ).alias("hi"),
            "n_items",
        )
        .orderBy("bin")
    )


NUMERIC_HISTOGRAM_ORACLE = f"""
WITH stats AS (
  SELECT min(l_extendedprice) AS lo_all, max(l_extendedprice) AS hi_all
  FROM lineitem
), binned AS (
  SELECT CAST(least(floor((l_extendedprice - lo_all) /
                          ((hi_all - lo_all) / {HISTOGRAM_BINS})),
                    {HISTOGRAM_BINS - 1}) AS BIGINT) AS bin,
         lo_all, hi_all
  FROM lineitem, stats
)
SELECT bin,
       ((2 * ({HISTOGRAM_BINS} * lo_c + bin * (hi_c - lo_c)) + {HISTOGRAM_BINS})
        // (2 * {HISTOGRAM_BINS})) / 100.0 AS lo,
       ((2 * ({HISTOGRAM_BINS} * lo_c + (bin + 1) * (hi_c - lo_c)) + {HISTOGRAM_BINS})
        // (2 * {HISTOGRAM_BINS})) / 100.0 AS hi,
       n_items
FROM (
  SELECT bin,
         CAST(round(max(lo_all) * 100) AS BIGINT) AS lo_c,
         CAST(round(max(hi_all) * 100) AS BIGINT) AS hi_c,
         count(*) AS n_items
  FROM binned
  GROUP BY bin
)
ORDER BY bin
"""


def mad_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust (median/MAD) outlier census per event type — the
    resistant-statistics counterpart to value_outliers' mean/σ z-score:
    median and MAD ignore the very outliers they're hunting, so a few
    extreme values can't drag the gate (the classic robust-stats
    argument; consistency constant 1.4826 rescales MAD to σ under
    normality).

    Output: (event_type, n, med, mad, n_outliers, outlier_frac) — one
    row per type; a point is an outlier when |x − med| > k·1.4826·MAD.

    Shape: two type-keyed exact-median aggregates over the events scan
    (Spark ``median`` is the sort-based exact percentile; at 100 TB
    you'd swap both for ``approx_percentile`` — the plan shape is
    identical), with the 5-row median table broadcast back between
    passes. The gate compares continuous doubles (the value_outliers
    boundary-determinism argument).
    """
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    j = events.join(F.broadcast(med), "event_type")
    stats = j.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
    )
    scored = events.join(F.broadcast(stats), "event_type")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("med"), 4).alias("med"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > F.lit(k) * F.lit(1.4826) * F.col("mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
        .withColumn(
            # integer-ratio round at 4dp by half-up integer division
            # (e.g. 3/160 = 0.01875 sits exactly on the boundary and the
            # engines' float round()s pick opposite sides).
            "outlier_frac",
            F.expr("(20000 * n_outliers + n) div (2 * n)") / 10000.0,
        )
        .orderBy("event_type")
    )


MAD_OUTLIERS_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
), stats AS (
  SELECT e.event_type, min(m.med) AS med,
         median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_type,
       count(*) AS n,
       round(min(s.med), 4) AS med,
       round(min(s.mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * 1.4826 * s.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ((20000 * CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * 1.4826 * s.mad
                               THEN 1 ELSE 0 END) AS BIGINT) + count(*))
        // (2 * count(*))) / 10000.0 AS outlier_frac
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def k_anonymity_census(customer: DataFrame) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers — the
    privacy check a training-data pipeline runs before release: for the
    quasi-identifier tuple (nation, market segment, account-balance
    kilo-bucket), how many records sit in equivalence classes of size
    k — a k=1 row is a unique, re-identifiable combination. Rows per
    k-band: (k_band, n_classes, n_rows, pct_rows) for bands
    'k=1' / 'k=2-4' / 'k=5-9' / 'k>=10'.

    Shape: one hash aggregate to equivalence classes (bounded by the
    quasi-identifier domain), a second tiny aggregate over class sizes,
    and a broadcast 1-row total for the share. Exactness: pure integer
    counting; pct_rows is one correctly-rounded division of exact
    BIGINTs (emitted raw — the tie-capable-ratio round is forbidden) —
    bit-identical cross-engine.

    Spark's int cast TRUNCATES while DuckDB's ROUNDS (verify notes), so
    the kilo-bucket uses explicit floor() on both sides.
    """
    classes = (
        customer.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_k"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    band = (
        F.when(F.col("k") == 1, F.lit("k=1"))
        .when(F.col("k") <= 4, F.lit("k=2-4"))
        .when(F.col("k") <= 9, F.lit("k=5-9"))
        .otherwise(F.lit("k>=10"))
    )
    per_band = classes.groupBy(band.alias("k_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    total = per_band.agg(F.sum("n_rows").alias("total"))
    return (
        per_band.crossJoin(F.broadcast(total))
        .select(
            "k_band",
            "n_classes",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total").cast("double"))
            .alias("pct_rows"),
        )
        .orderBy("k_band")
    )


K_ANONYMITY_CENSUS_ORACLE = """
WITH classes AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
         CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY 1, 2, 3
), per_band AS (
  SELECT CASE WHEN k = 1 THEN 'k=1'
              WHEN k <= 4 THEN 'k=2-4'
              WHEN k <= 9 THEN 'k=5-9'
              ELSE 'k>=10' END AS k_band,
         CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(k) AS BIGINT) AS n_rows
  FROM classes GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM per_band
)
SELECT k_band, n_classes, n_rows,
       CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS pct_rows
FROM per_band, tot
ORDER BY k_band
"""
