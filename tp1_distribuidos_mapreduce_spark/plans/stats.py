"""Statistical-model aggregates: grouped OLS trend lines, Pearson
correlation, a chi-square independence test, a two-sample
Kolmogorov-Smirnov test, Shannon entropy, and a Benford first-digit
audit — the "is this effect real" layer a metrics warehouse runs on top
of the plain rollups (plans/relational.py has the rollups; this module
fits models and tests to them).

Exactness discipline (verify notes / ADVICE r7): every sufficient
statistic (Σx, Σy, Σxy, Σx², Σy², contingency counts, cumulative
counts) is an exact integer sum — BIGINT while the documented headroom
holds, DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) where squares of cents
can pass 2⁶³ — so no cross-engine partial-aggregation order can perturb
it; floats appear only in (a) single IEEE-correctly-rounded
divisions/sqrt chains over identical exact integers — bit-identical
across engines; (b) ordered folds, which both engines evaluate as the
SAME left-to-right reduction over the (small, sorted) cell list, so
even the non-associative double additions happen in one canonical
order; and (c) transcendental (log) terms, rounded to 6dp as the
continuous tie-safe class the exactness audit documents — with any
shared CONSTANT (ln 2, Benford's expected shares) injected as the SAME
Python float literal into both engines' plans so no per-engine libm
call can split them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Anchor for the day index: inside the fixture's date range so the
# centered x values (and thus Σx² and the slope denominator) stay far
# from BIGINT limits even at a 100 TB row count. Any fixed date works —
# OLS slope is translation-invariant in x — but a nearby anchor keeps
# the sufficient statistics small.
_X_EPOCH = "1995-01-01"


def nation_revenue_trend(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation revenue trend: the least-squares slope (in cents per
    day) of DAILY order revenue against the day index — "is this
    nation's business growing, and how fast".

    Shape: one shuffle aggregates order cents to (nation, day) points
    — the fact table collapses to at most nations×days rows before any
    regression math — then a second (tiny) aggregate per nation builds
    the OLS sufficient statistics n, Σx, Σy, Σxy, Σx². The nation
    dimension broadcasts; the slope is closed-form, no iteration.

    Exactness: x = whole days since 1995-01-01 (BIGINT), y = integral
    cents (BIGINT), so all five statistics are exact integer sums and
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is ONE division of two
    identical BIGINTs — IEEE-correctly-rounded, bit-identical across
    engines, no rounding step needed. Headroom: with day indices |x| ≤
    ~2·10³ and daily cents ≤ ~10¹⁰ even at 100 TB, nΣxy stays ≤ ~10¹⁷
    < 2⁶³; past that, widen the products to decimal(38,0).

    Nations whose orders all land on one day have a zero denominator
    (slope undefined) and are excluded rather than emitted as NULL/inf.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    x = F.datediff(F.col("o_orderdate"), F.lit(_X_EPOCH).cast("date")).cast(
        "long"
    )
    daily = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name"), x.alias("x"), cents.alias("cents"))
        .groupBy("n_name", "x")
        .agg(F.sum("cents").alias("y"))
    )
    stats = daily.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        stats.withColumn("den", den)
        .where(F.col("den") != 0)
        .select(
            "n_name",
            "n_days",
            (num.cast("double") / F.col("den")).alias("slope_cents_per_day"),
        )
        .orderBy("n_name")
    )


NATION_REVENUE_TREND_ORACLE = f"""
WITH daily AS (
  SELECT n_name,
         CAST(date_diff('day', DATE '{_X_EPOCH}', o_orderdate) AS BIGINT) AS x,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY n_name, date_diff('day', DATE '{_X_EPOCH}', o_orderdate)
), stats AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_days,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY n_name
)
SELECT n_name, n_days,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
         / (n_days * sxx - sx * sx) AS slope_cents_per_day
FROM stats
WHERE n_days * sxx - sx * sx <> 0
ORDER BY n_name
"""


def event_weekday_chi2(events: DataFrame) -> DataFrame:
    """Chi-square test of independence between event_type and weekday —
    "does activity mix actually shift across the week, or is the
    weekend dip noise". One row: (n_cells, dof, chi2, cramers_v).

    Shape: one hash aggregate builds the contingency table (types × 7
    cells — tiny regardless of input size), the row/column/grand totals
    join back as broadcast frames, and the statistic folds over the
    sorted cell list inside one row: sort_array(collect_list(...)) is
    safe because the cell count is bounded by the type-vocabulary × 7,
    not by the data.

    Exactness: each cell's term is (N·o − r·c)²/(N·r·c) with N, o, r, c
    exact BIGINTs. The difference d = N·o − r·c is exact BIGINT
    arithmetic (headroom: N·o ≤ ~10¹⁸ needs N·max(o) < 2⁶³ — true below
    ~3·10⁹ events; past that widen to decimal(38,0)), converted once to
    double (exact for |d| < 2⁵³); the denominator multiplies the three
    counts AS DOUBLES left-to-right so it cannot overflow at any scale;
    the term is then d·d/den — every float op correctly rounded on
    identical inputs in both engines. The non-associative part —
    summing the terms — runs as an ORDERED left fold over cells sorted
    by (event_type, weekday) in BOTH engines (Spark F.aggregate over
    sort_array; DuckDB list_reduce over list(... ORDER BY ...) with a
    prepended 0.0 to mirror Spark's init), so the doubles add in one
    canonical order and the statistic is bit-identical, not merely
    close. cramers_v = sqrt(chi2/(N·min(R−1,C−1))) — sqrt and division
    are single correctly-rounded ops, so determinism survives.
    """
    cells = events.groupBy(
        F.col("event_type"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    row_tot = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    col_tot = cells.groupBy("dow").agg(F.sum("o").alias("c"))
    n_total = cells.agg(F.sum("o").alias("N"))
    joined = (
        cells.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "dow")
        .crossJoin(F.broadcast(n_total))
    )
    d = (F.col("N") * F.col("o") - F.col("r") * F.col("c")).cast("double")
    den = (
        F.col("N").cast("double")
        * F.col("r").cast("double")
        * F.col("c").cast("double")
    )
    folded = (
        joined.select(
            "event_type", "dow", (d * d / den).alias("term"), "N"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.countDistinct("dow").cast("long").alias("n_dows"),
            F.first("N").alias("N"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct("event_type", "dow", "term"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["term"],
            ).alias("chi2"),
        )
    )
    dof = (F.col("n_types") - 1) * (F.col("n_dows") - 1)
    mindim = F.least(F.col("n_types") - 1, F.col("n_dows") - 1)
    return folded.select(
        "n_cells",
        dof.alias("dof"),
        "chi2",
        F.sqrt(F.col("chi2") / (F.col("N") * mindim).cast("double")).alias(
            "cramers_v"
        ),
    )


EVENT_WEEKDAY_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type,
         CAST(date_part('dow', ts) AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, date_part('dow', ts)
), tot AS (
  SELECT cells.*,
         sum(o) OVER (PARTITION BY event_type) AS r,
         sum(o) OVER (PARTITION BY dow) AS c,
         sum(o) OVER () AS N
  FROM cells
), dims AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(count(DISTINCT dow) AS BIGINT) AS n_dows,
         CAST(sum(o) AS BIGINT) AS N
  FROM cells
), folded AS (
  SELECT CAST(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(N * o - r * c AS DOUBLE)
                    * CAST(N * o - r * c AS DOUBLE)
                    / (CAST(N AS DOUBLE) * CAST(r AS DOUBLE)
                       * CAST(c AS DOUBLE))
                  ORDER BY event_type, dow)),
           (a, b) -> a + b) AS DOUBLE) AS chi2
  FROM tot
)
SELECT d.n_cells,
       (d.n_types - 1) * (d.n_dows - 1) AS dof,
       f.chi2,
       sqrt(f.chi2 / (CAST(d.N AS DOUBLE) * least(d.n_types - 1, d.n_dows - 1)))
         AS cramers_v
FROM dims d, folded f
"""


def brand_qty_price_corr(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Per-brand Pearson correlation between line quantity and extended
    price — "does this brand's price actually scale with quantity".

    Shape: the part dimension broadcasts; ONE shuffle builds the six
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) per brand as a
    partial-aggregated hash agg, then r is closed-form per group — no
    second pass, no window, no iteration.

    Exactness: x = integral quantity, y = integral cents, both cast to
    DECIMAL(18,0) BEFORE multiplying so every product and sum is exact
    decimal integer arithmetic (Σy² at 100 TB passes 2⁶³ — BIGINT would
    silently wrap; DECIMAL(38,0) holds ~10³⁸, and the oracle mirrors
    with HUGEINT). r = (nΣxy−ΣxΣy)/√(nΣx²−Σx²)/√(nΣy²−Σy²) is evaluated
    as the SAME left-to-right divide-sqrt-divide chain in both engines
    over identical exact integers, every step IEEE-correctly-rounded —
    bit-identical output, no rounding needed. Degenerate brands (zero
    variance on either axis) are excluded rather than emitted NULL/NaN.
    """
    x = F.round("l_quantity").cast("decimal(18,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    base = lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    ).select(F.col("p_brand"), x.alias("x"), y.alias("y"))
    s = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    da = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    db = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.withColumn("da", da)
        .withColumn("db", db)
        .where((F.col("da") != 0) & (F.col("db") != 0))
        .select(
            "p_brand",
            "n_items",
            (
                num.cast("double")
                / F.sqrt(F.col("da").cast("double"))
                / F.sqrt(F.col("db").cast("double"))
            ).alias("corr_qty_price"),
        )
        .orderBy("p_brand")
    )


BRAND_QTY_PRICE_CORR_ORACLE = """
WITH base AS (
  SELECT p_brand,
         CAST(round(l_quantity) AS HUGEINT) AS x,
         CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
), s AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM base GROUP BY p_brand
)
SELECT p_brand, n_items,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_price
FROM s
WHERE n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
ORDER BY p_brand
"""


def revenue_autocorrelation(orders: DataFrame) -> DataFrame:
    """Lag-1 autocorrelation of daily order revenue — "does a strong day
    predict the next one", the first sanity check before any forecast.

    Shape: one shuffle collapses orders to ≤ a-few-thousand (day, cents)
    points; the lead() pairing and the Pearson fold then run on that
    POST-AGGREGATION frame, so the unpartitioned day-ordered window is
    bounded by the calendar (~2.4k rows on TPC-H dates), never by the
    fact-table row count — same smallness argument as
    daily_revenue_moving_avg. Only CONSECUTIVE days pair (lead day must
    be day+1); gaps contribute no pair rather than a bogus one.

    Exactness: identical to brand_qty_price_corr — DECIMAL(38,0)/HUGEINT
    sufficient statistics over exact daily cent totals (squares of daily
    cents pass 2⁶³ long before 100 TB), one divide-sqrt-divide chain,
    bit-identical across engines.
    """
    daily = (
        orders.select(
            F.datediff(
                F.col("o_orderdate"), F.lit(_X_EPOCH).cast("date")
            ).cast("long").alias("day"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.orderBy("day")
    pairs = (
        daily.withColumn("next_day", F.lead("day").over(w))
        .withColumn("next_cents", F.lead("cents").over(w))
        .where(F.col("next_day") == F.col("day") + 1)
        .select(
            F.col("cents").cast("decimal(18,0)").alias("x"),
            F.col("next_cents").cast("decimal(18,0)").alias("y"),
        )
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    da = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    db = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.withColumn("da", da)
        .withColumn("db", db)
        .where((F.col("da") != 0) & (F.col("db") != 0))
        .select(
            "n_pairs",
            (
                num.cast("double")
                / F.sqrt(F.col("da").cast("double"))
                / F.sqrt(F.col("db").cast("double"))
            ).alias("autocorr_lag1"),
        )
    )


REVENUE_AUTOCORRELATION_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '{_X_EPOCH}', o_orderdate) AS BIGINT)
           AS day,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), pairs AS (
  SELECT CAST(cents AS HUGEINT) AS x,
         CAST(lead_cents AS HUGEINT) AS y
  FROM (SELECT day, cents,
               lead(day) OVER (ORDER BY day) AS next_day,
               lead(cents) OVER (ORDER BY day) AS lead_cents
        FROM daily) t
  WHERE next_day = day + 1
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs
)
SELECT n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr_lag1
FROM s
WHERE n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
"""
