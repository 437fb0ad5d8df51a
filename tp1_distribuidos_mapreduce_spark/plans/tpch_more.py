"""Remaining TPC-H-shaped classics over the fixture's (partsupp-less)
schema, plus entity-resolution and concurrency analytics: Q4 (correlated
EXISTS), Q13 (custdist outer-join distribution), Q17 (small-quantity
revenue vs per-part average), Q8 (market-share matrix), a blocked
Levenshtein fuzzy-match self-join, and a sweep-line maximum-concurrency
query.

Reference scope note: the reference engine (kmu01/TP1-Distribuidos-
MapReduce) exposes a generic map/reduce plugin surface (rpc/work.proto,
plugins/wc/wc.go) — every query here is a composition its users would
hand-write as plugins; here each is one declarative Catalyst plan.

Scale shapes (100 TB):
- Q4/Q17 keep the correlated side as an equi-join on the key with the
  inequality as a post-join filter — Spark plans LEFT SEMI / broadcast
  hash joins, never a nested loop.
- Q13 is the canonical outer-join + double aggregate; both aggregates
  have map-side partials.
- Q8's dimension chain (customer→nation→region, supplier→nation) is
  broadcast end-to-end; only the lineitem⨝orders join shuffles.
- The fuzzy match BLOCKS (same noun token) before the quadratic
  Levenshtein verify, the standard ER blocking pattern — the self-join
  is per-block, never corpus×corpus.
- Max-concurrency partitions the sweep line by day so no single window
  partition carries the whole timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# Q4: order-priority check — EXISTS with a correlated date inequality
# --------------------------------------------------------------------------


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Orders (in 1996) having at least one line item shipped more than
    60 days after the order date, counted per priority — TPC-H Q4 with
    the fixture's l_shipdate standing in for the missing
    l_commitdate/l_receiptdate pair.

    Plan shape: the correlated EXISTS becomes a LEFT SEMI equi-join on
    l_orderkey with the date inequality as a join-side filter; the year
    filter prunes orders before the shuffle and Catalyst pushes the
    lineitem column prune to the scan (only l_orderkey + l_shipdate are
    read). The 60-day cutoff is full-TIMESTAMP interval arithmetic
    (o_orderdate + INTERVAL 60 DAYS, no to_date truncation) so it stays
    exact for fixtures whose order dates carry a time-of-day component.
    """
    o = orders.where(F.year("o_orderdate") == 1996)
    late = o.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        on=[
            o["o_orderkey"] == F.col("l_orderkey"),
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        ],
        how="left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE year(o_orderdate) = 1996
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q13: customer order-count distribution (outer join + double aggregate)
# --------------------------------------------------------------------------


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """How many customers placed exactly k orders (excluding low-priority
    ones), including the zero-order customers — TPC-H Q13.

    The LEFT OUTER join is what makes this a classic: the k=0 bucket
    only exists because customers with no qualifying orders survive the
    join with a NULL o_orderkey, which count("o_orderkey") ignores. Both
    aggregates are hash aggregates with map-side partials; the second
    one runs over at most |distinct k| ≪ |customers| rows.
    """
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "5-LOW").select(
                "o_custkey", "o_orderkey"
            ),
            customer["c_custkey"] == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue vs the per-part average
# --------------------------------------------------------------------------


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Average yearly revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) for one brand went unfilled —
    TPC-H Q17.

    The correlated scalar subquery (per-part avg quantity) becomes a
    standalone aggregate joined back on l_partkey. Both the brand-pruned
    part dimension AND the per-part averages are part-cardinality —
    broadcast, so the probe over lineitem is map-side only and the only
    wide exchange is the aggregate's own partial→final step.

    Output rounded at 2dp (sum-order float wobble is far below cents).
    """
    brand_parts = part.where(F.col("p_brand") == "Brand#23").select("p_partkey")
    avg_qty = (
        lineitem.join(
            F.broadcast(brand_parts),
            lineitem["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cut"))
    )
    small = (
        lineitem.join(F.broadcast(avg_qty), "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_cut"))
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


Q17_ORACLE = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


# --------------------------------------------------------------------------
# Q8: market-share matrix — supplier-nation share of a region's revenue
# --------------------------------------------------------------------------


def q8_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Each supplier nation's share of yearly revenue in the ASIA
    customer market — TPC-H Q8 generalized from one nation's share to
    the full (year × supp_nation) share matrix.

    Plan: the entire dimension chain (region→nation→customer on the
    market side, nation→supplier on the share side) is broadcast — the
    only shuffled join is lineitem⨝orders on orderkey, followed by one
    hash aggregate. Share = nation revenue / window-sum over the year:
    the window runs over |years × nations| aggregated rows, not data.
    """
    asia_customers = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == "ASIA")),
                    nation["n_regionkey"] == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            customer["c_nationkey"] == F.col("n_nationkey"),
            "left_semi",
        ).select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    rev = (
        lineitem.join(
            orders.join(
                F.broadcast(asia_customers),
                orders["o_custkey"] == F.col("c_custkey"),
                "left_semi",
            ).select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp_nation), lineitem["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("o_year", "supp_nation")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "nation_rev"
            )
        )
    )
    total = Window.partitionBy("o_year")
    return rev.select(
        "o_year",
        "supp_nation",
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(total), 4).alias(
            "mkt_share"
        ),
    ).orderBy("o_year", "supp_nation")


Q8_ORACLE = """
WITH rev AS (
  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
         sum(l_extendedprice * (1 - l_discount)) AS nation_rev
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  GROUP BY 1, 2
)
SELECT o_year, supp_nation,
       round(nation_rev / sum(nation_rev) OVER (PARTITION BY o_year), 4)
         AS mkt_share
FROM rev
ORDER BY o_year, supp_nation
"""


# --------------------------------------------------------------------------
# Entity resolution: blocked Levenshtein fuzzy self-match on part names
# --------------------------------------------------------------------------


def fuzzy_part_match(part: DataFrame, max_dist: int = 3) -> DataFrame:
    """Near-identical part-name pairs: same head noun (last token — the
    blocking key) and full-name Levenshtein distance ≤ ``max_dist``,
    keyed a<b so each unordered pair appears once.

    This is the standard entity-resolution shape: a cheap BLOCKING key
    cuts the candidate space from |parts|² to Σ|block|², then the
    expensive edit-distance verify runs only inside blocks. At 100 TB
    the block self-join shuffles on the blocking key; a skewed block
    (one noun dominating) would get the same salting treatment as
    operators/skew.py. Distinct p_name pairs — the same name pair
    repeated across part rows collapses, keeping output entity-shaped.
    """
    names = part.select(
        "p_name", F.element_at(F.split("p_name", " "), -1).alias("block")
    ).distinct()
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(b, "block")
        .where(F.col("a.p_name") < F.col("b.p_name"))
        .where(
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= max_dist
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("long")
            .alias("edit_dist"),
        )
        .orderBy("name_a", "name_b")
    )


FUZZY_PART_ORACLE = """
WITH names AS (
  SELECT DISTINCT p_name,
         list_extract(string_split(p_name, ' '), -1) AS block
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM names a JOIN names b USING (block)
WHERE a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name_a, name_b
"""


# --------------------------------------------------------------------------
# Sweep line: maximum concurrent user sessions per day
# --------------------------------------------------------------------------


def max_concurrent_sessions(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Peak number of simultaneously-active user sessions per day, via
    the classic sweep line: sessionize (30-min inactivity gap), emit a
    +1 at each session start and a −1 at its end, order the deltas in
    time and take the running sum's maximum.

    The running sum partitions by DAY (sessions here never straddle
    midnight UTC in effect because the cut assigns each session to its
    start day and the max is per-day by construction), so no window
    partition ever carries the whole timeline — the scale requirement
    for any sweep-line query. Tie order matters: at the same timestamp
    ends sort before starts (delta ascending: −1 first), the
    non-overlapping convention shared with the oracle.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts")
    gap_s = gap_min * 60
    sess = (
        events.select("user_id", "ts")
        .withColumn("prev_ts", F.lag("ts").over(w_user))
        .withColumn(
            "new_sess",
            (
                F.col("prev_ts").isNull()
                | (
                    F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                    > gap_s
                )
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w_user))
        .groupBy("user_id", "sess_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    deltas = sess.select(
        F.to_date("start_ts").alias("day"),
        F.col("start_ts").alias("t"),
        F.lit(1).alias("delta"),
    ).unionByName(
        sess.select(
            F.to_date("start_ts").alias("day"),
            F.col("end_ts").alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w_sweep = Window.partitionBy("day").orderBy("t", "delta")
    return (
        deltas.withColumn("running", F.sum("delta").over(w_sweep))
        .groupBy("day")
        .agg(F.max("running").cast("long").alias("peak_concurrent"))
        .orderBy("day")
    )


MAX_CONCURRENT_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, sess_id, min(ts) AS start_ts, max(ts) AS end_ts
  FROM (SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked)
  GROUP BY user_id, sess_id
), deltas AS (
  SELECT CAST(start_ts AS DATE) AS day, start_ts AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT CAST(start_ts AS DATE), end_ts, -1 FROM sess
)
SELECT day, CAST(max(running) AS BIGINT) AS peak_concurrent
FROM (SELECT day,
             sum(delta) OVER (PARTITION BY day ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM deltas)
GROUP BY day
ORDER BY day
"""
