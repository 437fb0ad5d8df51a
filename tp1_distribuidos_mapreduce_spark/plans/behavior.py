"""Behavioral event analytics: ordered funnel conversion and weekly
cohort retention — the two workhorse product-analytics workloads over an
events table.

Additive surface (the reference has no time semantics at all). Both are
pure DataFrame compositions with exact DuckDB oracles; every shuffle is
keyed on user_id or a (cohort, offset) pair — fixed-width, user- or
matrix-cardinality, never event-cardinality after the first aggregate.

Funnel semantics are ORDERED (the strict product definition): a user
converts view→click only if some click happens at-or-after their first
view, and click→purchase only if some purchase happens at-or-after that
first qualifying click. Unordered "did both ever happen" funnels
overcount; the ordering is what makes this a join-and-min cascade rather
than a single conditional aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered view→click→purchase funnel: per stage, how many users
    reached it (in order) and the conversion rate from stage 1, rounded.

    Shape: one conditional aggregate for first-view per user (event scan
    → user-cardinality), then two filtered re-aggregations of the event
    scan joined against the previous stage's user table — each join is
    user-cardinality on both sides and broadcastable; no event-sized
    shuffle after the first groupBy. At 100 TB the three stage tables are
    ~|users| rows against a ~|events| scan, the textbook funnel plan.

    All three stage counts come out of ONE driver action: the later
    stages left-join onto first_view (a containment chain — every
    click-converter is a view-converter) and a single count-non-null
    aggregate produces (n1, n2, n3). The shared first_view / first_click
    subtrees end in identical exchanges, which Spark's exchange reuse
    (spark.sql.exchange.reuse, on by default) materializes once — the
    round-7 version's three .count() actions re-executed the cascade
    across jobs (~6 event scans); this is one job, one pass per stage
    filter, reused shuffles.

    Conversion uses explicit round-half-up (floor(x*1e4 + 0.5)/1e4) to
    match DuckDB/Spark round() semantics — Python's round() is
    half-to-even and diverges on exactly-representable halves such as
    1/32 (ADVICE r7).
    """
    ev = events.select("user_id", "event_type", "ts")
    first_view = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    first_click = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[1])
        .join(first_view, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    first_purchase = (
        ev.where(F.col("event_type") == FUNNEL_STAGES[2])
        .join(first_click, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        first_view.join(first_click, "user_id", "left")
        .join(first_purchase, "user_id", "left")
        .agg(
            F.count("t_view").alias("n1"),
            F.count("t_click").alias("n2"),
            F.count("t_purchase").alias("n3"),
        )
        .first()
    )
    n1, n2, n3 = counts["n1"], counts["n2"], counts["n3"]

    def _conv(n: int) -> float:
        if not n1:
            return 0.0
        return math.floor(n / n1 * 10000 + 0.5) / 10000

    spark = events.sparkSession
    rows = [
        (1, FUNNEL_STAGES[0], n1, 1.0),
        (2, FUNNEL_STAGES[1], n2, _conv(n2)),
        (3, FUNNEL_STAGES[2], n3, _conv(n3)),
    ]
    return spark.createDataFrame(
        rows, "stage int, event_type string, n_users bigint, conversion double"
    ).orderBy("stage")


FUNNEL_CONVERSION_ORACLE = """
WITH first_view AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), first_click AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
), first_purchase AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN first_click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
), counts AS (
  SELECT (SELECT count(*) FROM first_view) AS n1,
         (SELECT count(*) FROM first_click) AS n2,
         (SELECT count(*) FROM first_purchase) AS n3
)
SELECT * FROM (
  SELECT 1 AS stage, 'view' AS event_type, CAST(n1 AS BIGINT) AS n_users,
         1.0 AS conversion FROM counts
  UNION ALL
  SELECT 2, 'click', CAST(n2 AS BIGINT),
         CASE WHEN n1 = 0 THEN 0.0 ELSE round(n2 / n1, 4) END FROM counts
  UNION ALL
  SELECT 3, 'purchase', CAST(n3 AS BIGINT),
         CASE WHEN n1 = 0 THEN 0.0 ELSE round(n3 / n1, 4) END FROM counts
)
ORDER BY stage
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of their
    first event; for each later week, how many of that cohort were active.

    Shape: first-week per user (event scan → user table), distinct
    (user, week) activity pairs (event scan → user×weeks), one join on
    user_id, final aggregate on the (cohort, offset) matrix — bounded by
    users × observed weeks, tiny relative to events at any scale. The
    week offset divides a day difference of week-truncated dates, so it's
    exact integer arithmetic with explicit floor() on both engines
    (DuckDB's int cast rounds where Spark's truncates — SKILL.md gotcha).
    """
    ev = events.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
    first_week = ev.groupBy("user_id").agg(F.min("w").alias("w0"))
    active = ev.distinct()
    matrix = (
        active.join(first_week, "user_id")
        .select(
            F.to_date("w0").alias("cohort_week"),
            F.floor(F.datediff(F.to_date("w"), F.to_date("w0")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
    return matrix


COHORT_RETENTION_ORACLE = """
WITH ev AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
), first_week AS (
  SELECT user_id, min(w) AS w0 FROM ev GROUP BY user_id
)
SELECT f.w0 AS cohort_week,
       CAST(floor(date_diff('day', f.w0, e.w) / 7) AS INTEGER) AS week_offset,
       count(*) AS n_users
FROM ev e JOIN first_week f ON e.user_id = f.user_id
GROUP BY f.w0, week_offset
ORDER BY cohort_week, week_offset
"""


PATH_MAX_EVENTS = 8
PATH_TOP_K = 20


def top_event_paths(
    events: DataFrame,
    max_events: int = PATH_MAX_EVENTS,
    top_k: int = PATH_TOP_K,
) -> DataFrame:
    """Journey mining: the most common ordered event-type paths, where a
    user's path is their first ``max_events`` events joined 'a>b>c'.

    Ordering ties (identical timestamps) break on event_id, so the path
    strings are fully deterministic on both engines. The prefix cap is
    applied by a rank filter BEFORE the collect — a collect_list-then-
    slice formulation would still materialize a hyperactive user's whole
    history inside the aggregate; filtering ``row_number() <= max_events``
    first bounds the aggregate's per-user state at ``max_events`` structs
    no matter the skew. Shuffles: user-keyed window + bounded aggregate,
    then path-cardinality counts.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_events)
        .groupBy("user_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("rn", "event_type"))).alias("es")
        )
        .select(
            F.array_join(
                F.transform("es", lambda s: s["event_type"]), ">"
            ).alias("path")
        )
    )
    return (
        per_user.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(top_k)
    )


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix between consecutive event
    types per user: count and row-normalized probability for every
    (from_type, to_type) cell.

    Ordering ties break on event_id (same discipline as
    top_event_paths), so the lag pairing is deterministic on both
    engines. Shuffles: one user-keyed window (the lag), then a
    type×type-cardinality aggregate — fixed-width output no matter the
    event volume; the probability divides two BIGINTs of the same
    aggregate so the 4dp round is engine-exact.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )
    wrow = Window.partitionBy("from_type")
    return (
        counts.withColumn("tot", F.sum("n_transitions").over(wrow))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            # half-up integer division at 4dp: round() of an exact
            # integer ratio still ties at the 5th decimal, and the
            # engines' float round()s pick opposite sides there.
            (
                F.expr("(20000 * n_transitions + tot) div (2 * tot)") / 10000.0
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


EVENT_TRANSITION_ORACLE = """
WITH steps AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM steps WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       ((20000 * n_transitions + tot) // (2 * tot)) / 10000.0 AS prob
FROM (
  SELECT from_type, to_type, n_transitions,
         sum(n_transitions) OVER (PARTITION BY from_type) AS tot
  FROM counts
)
ORDER BY from_type, to_type
"""


TOP_EVENT_PATHS_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), per_user AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= {PATH_MAX_EVENTS}
  GROUP BY user_id
)
SELECT path, count(*) AS n_users
FROM per_user
GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {PATH_TOP_K}
"""


ROLLING_WINDOW_DAYS = 7


def rolling_active_users(events: DataFrame, days: int = ROLLING_WINDOW_DAYS) -> DataFrame:
    """Rolling 7-day active users per calendar day — the DAU/WAU board
    metric, computed EXACTLY (no sketch) with a scalable plan.

    Naive formulations are a rolling COUNT(DISTINCT) window (unsupported
    or quadratic in most engines) or a day×day range self-join. Instead:
    dedup events to (day, user) pairs FIRST (the big shuffle, bounded by
    users×days not events), then explode each pair to the ``days``
    window end-days it contributes to — an in-row sequence, turning the
    range join into a linear ×7 map — and count distinct users per end
    day. End days past the observed maximum are cut by a broadcast 1-row
    max-day aggregate, so every reported day has complete-window-or-
    partial-from-data semantics identical to the oracle's.

    Output: (day DATE, active_users) for every day observed in the data
    plus tail days still covered by a trailing window.
    """
    day_user = events.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    max_day = events.agg(F.max(F.to_date("ts")).alias("max_day"))
    contributes = (
        day_user.select(
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), days - 1)
                )
            ).alias("day"),
            "user_id",
        )
        .join(F.broadcast(max_day))
        .where(F.col("day") <= F.col("max_day"))
    )
    return (
        contributes.groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
        .orderBy("day")
    )


def rolling_active_users_oracle(days: int = ROLLING_WINDOW_DAYS) -> str:
    """Oracle for ``rolling_active_users`` at any window length —
    parameterized builder (the r9 ADVICE discipline: the oracle derives
    from the same parameter the plan receives, so a window-length edit
    can never desynchronize the pair). Same gap-day convention as the
    plan: every window end from first event day through max observed
    day, including eventless calendar days."""
    return f"""
WITH day_user AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), max_day AS (
  SELECT max(CAST(ts AS DATE)) AS max_day FROM events
), contributes AS (
  SELECT CAST(day + to_days(CAST(i AS INTEGER)) AS DATE) AS day, user_id
  FROM day_user, LATERAL (SELECT unnest(generate_series(0, {days - 1})) AS i)
)
SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS active_users
FROM contributes c, max_day m
WHERE c.day <= m.max_day
GROUP BY c.day
ORDER BY c.day
"""


ROLLING_ACTIVE_USERS_ORACLE = rolling_active_users_oracle()


def user_state_islands(events: DataFrame) -> DataFrame:
    """Gaps-and-islands: collapse each user's consecutive same-type event
    runs into validity intervals — the SCD2-style state history a
    warehouse derives from an event stream.

    The classic two-window formulation: a lag marks run boundaries, a
    cumulative sum numbers the runs (island id), then one aggregate per
    (user, island) yields the interval. Both windows are PARTITIONED BY
    user_id — no global sort, parallel across users at any scale; the
    output is island-cardinality.

    Output: (user_id, event_type, valid_from, valid_to, n_events) per
    island, plus is_current for each user's last island.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (
            F.coalesce(
                (F.lag("event_type").over(w) != F.col("event_type")).cast("int"),
                F.lit(1),
            )
        ).alias("is_boundary"),
    ).withColumn(
        "island",
        F.sum("is_boundary").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = runs.groupBy("user_id", "island").agg(
        F.first("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_last = Window.partitionBy("user_id")
    return (
        islands.withColumn(
            "is_current",
            (F.col("island") == F.max("island").over(w_last)).cast("long"),
        )
        .select(
            "user_id",
            F.col("island").cast("long").alias("island"),
            "event_type",
            "valid_from",
            "valid_to",
            "n_events",
            "is_current",
        )
        .orderBy("user_id", "island")
    )


USER_STATE_ISLANDS_ORACLE = """
WITH runs AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS is_boundary
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_type, ts,
         sum(is_boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM runs
), islands AS (
  SELECT user_id, island,
         min(event_type) AS event_type,
         min(ts) AS valid_from,
         max(ts) AS valid_to,
         count(*) AS n_events
  FROM numbered
  GROUP BY user_id, island
)
SELECT user_id,
       CAST(island AS BIGINT) AS island,
       event_type,
       valid_from,
       valid_to,
       n_events,
       CAST(CASE WHEN island = max(island) OVER (PARTITION BY user_id)
            THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM islands
ORDER BY user_id, island
"""


def views_before_purchase(events: DataFrame, minutes: int = 30) -> DataFrame:
    """Banded range-join coverage: for every purchase event, how many
    views the SAME user made in the preceding ``minutes`` —
    (event_id, user_id, n_views) including zero-view purchases.

    Shape: an equi-join on user_id carrying a range predicate
    (p.ts − Δ <= v.ts < p.ts) — Catalyst plans the equi-key shuffle
    (sort-merge / shuffled-hash on user_id) and evaluates the band as a
    post-join filter, so per-task state is one user's sorted run, never a
    cross product. This is the attribution-window primitive ("views in
    the half hour before checkout"); purchase_asof_last_click covers the
    as-of (nearest-one) variant, this covers the count-in-band variant.
    """
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("pts")
    )
    v = events.where(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("vts")
    )
    joined = p.alias("p").join(
        v.alias("v"),
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.vts") >= F.col("p.pts") - F.expr(f"INTERVAL {minutes} MINUTES"))
        & (F.col("v.vts") < F.col("p.pts")),
        "left",
    )
    return (
        joined.groupBy(F.col("p.event_id").alias("event_id"), F.col("p.user_id").alias("user_id"))
        .agg(F.count(F.col("v.vts")).alias("n_views"))
        .orderBy("event_id")
    )


VIEWS_BEFORE_PURCHASE_ORACLE = """
SELECT p.event_id, p.user_id,
       CAST(count(v.ts) AS BIGINT) AS n_views
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 30 MINUTE
 AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
ORDER BY p.event_id
"""


# --------------------------------------------------------------------------
# Linear multi-touch attribution
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_HOURS = 24


def linear_attribution(events: DataFrame) -> DataFrame:
    """Linear multi-touch revenue attribution: each purchase's value is
    split EQUALLY across the same user's click/view touches in the
    preceding 24 hours, reported per touch type — the marketing-science
    counterpart of purchase_asof_last_click's last-touch rule.

    Exactness contract: the split is integer arithmetic end-to-end —
    purchase cents × 1000 div n_touches (floor, all operands positive)
    gives each touch an identical millicent share in Spark and DuckDB;
    the sub-millicent residue per purchase is deliberately unattributed
    (documented, deterministic) rather than float-divided, which would
    expose partial-sum rounding to engine order.

    Scale shape: touches ⨝ purchases is an equi-join on user_id with the
    time-range predicate as a join filter — per-user fan-out is bounded
    by a user's 24 h activity, and the join key distributes; no window
    over the full event stream exists. The per-purchase touch count is
    a purchase-keyed window over the pair table (purchase-cardinality
    partitions — NEVER broadcast: it scales with the data)."""
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = events.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_HOURS} HOURS")
        ),
    )
    wp = Window.partitionBy("p_id")
    return (
        pairs.withColumn("n_touches", F.count("*").over(wp))
        .withColumn("share_mc", F.expr("cents * 1000 div n_touches"))
        .groupBy("touch_type")
        .agg(
            (F.sum("share_mc") / 100000.0).alias("attributed_revenue"),
            F.count("*").cast("long").alias("n_touches"),
            F.countDistinct("p_id").cast("long").alias("n_purchases"),
        )
        .orderBy("touch_type")
    )


LINEAR_ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id AS t_user, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('click', 'view')
), pairs AS (
  SELECT p_id, cents, touch_type
  FROM purchases JOIN touches
    ON p_user = t_user
   AND t_ts < p_ts
   AND t_ts >= p_ts - INTERVAL 24 HOURS
), counted AS (
  SELECT p_id, count(*) AS n_touches FROM pairs GROUP BY p_id
)
SELECT touch_type,
       sum(cents * 1000 // n_touches) / 100000.0 AS attributed_revenue,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases
FROM pairs JOIN counted USING (p_id)
GROUP BY touch_type
ORDER BY touch_type
"""


# --------------------------------------------------------------------------
# Repeat-purchase cadence per market segment
# --------------------------------------------------------------------------


def repeat_purchase_intervals(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Days between a customer's consecutive orders, summarized per
    market segment (p25/median/p75 + repeat-customer count) — the
    purchase-cadence report behind replenishment and churn models.

    The lag window partitions by customer (high-cardinality key — the
    sort is per-customer, never global); gaps are integral day counts,
    so the exact percentile interpolation lands on .0/.5 values that
    Spark's percentile() and DuckDB's quantile_cont compute bit-
    identically. At 100 TB the exact percentile would become
    approx_percentile with a pinned error budget; the aggregate's input
    here is one row per repeat order, already far smaller than orders.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = (
        orders.select("o_custkey", "o_orderdate")
        .withColumn("prev_ts", F.lag("o_orderdate").over(w))
        .where(F.col("prev_ts").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.to_date("prev_ts")).alias(
                "gap_days"
            ),
        )
    )
    return (
        gaps.join(customer.select("c_custkey", "c_mktsegment"),
                  gaps["o_custkey"] == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.expr("percentile(gap_days, 0.25)").alias("p25_days"),
            F.expr("percentile(gap_days, 0.50)").alias("median_days"),
            F.expr("percentile(gap_days, 0.75)").alias("p75_days"),
            F.countDistinct("o_custkey").cast("long").alias("n_repeat_customers"),
            F.count("*").cast("long").alias("n_gaps"),
        )
        .orderBy("c_mktsegment")
    )


REPEAT_PURCHASE_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                  CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
)
SELECT c_mktsegment,
       quantile_cont(gap_days, 0.25) AS p25_days,
       quantile_cont(gap_days, 0.50) AS median_days,
       quantile_cont(gap_days, 0.75) AS p75_days,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
       CAST(count(*) AS BIGINT) AS n_gaps
FROM gaps JOIN customer ON c_custkey = o_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Purchases attributed to the browsing-state interval they occur in
# --------------------------------------------------------------------------


def purchases_by_browsing_state(events: DataFrame) -> DataFrame:
    """Which browsing state do purchases happen in? Builds SCD2-style
    state intervals from each user's NON-purchase events (the
    gaps-and-islands run collapse of user_state_islands) and interval-
    joins every purchase into the island containing its timestamp —
    the event⨝dimension-history enrichment every warehouse runs, here
    with the history derived in the same job.

    Purchases inside an island ([valid_from, valid_to]) are attributed;
    purchases landing in a gap between islands are counted in the
    'none' bucket. A purchase whose timestamp ties the boundary of two
    adjacent islands (possible when different-type events share a
    timestamp) matches both range predicates, so the join is followed
    by a deterministic per-purchase tie-break — keep the island with
    the LATEST valid_from (the state just entered), mirrored in the
    oracle — making the output genuinely PARTITION all purchases (each
    counted exactly once, NULL-free). Revenue folds as integral cents.

    Scale shape: both windows partition by user_id; the interval join is
    a user-keyed equi-join with the range predicate as a join filter —
    per-user fan-out is (user's purchases × user's islands), bounded per
    user, never a global range join; the tie-break window partitions by
    purchase id. At 100 TB the islands side would be bucketed by
    user_id to co-locate with the event stream.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = events.where(F.col("event_type") != "purchase")
    runs = base.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.coalesce(
            (F.lag("event_type").over(w) != F.col("event_type")).cast("int"),
            F.lit(1),
        ).alias("is_boundary"),
    ).withColumn(
        "island",
        F.sum("is_boundary").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = runs.groupBy("user_id", "island").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.max("ts").alias("valid_to"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    joined = purchases.join(
        islands,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("p_ts") <= F.col("valid_to")),
        "left",
    )
    # boundary-tie break: one island per purchase (latest valid_from)
    pick = Window.partitionBy("p_id").orderBy(
        F.desc_nulls_last("valid_from"), F.desc_nulls_last("island")
    )
    attributed = joined.withColumn("rn", F.row_number().over(pick)).where(
        F.col("rn") == 1
    )
    return (
        attributed.groupBy(F.coalesce("state", F.lit("none")).alias("state"))
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            (F.sum("cents") / 100.0).alias("purchase_value"),
        )
        .orderBy("state")
    )


PURCHASES_BY_STATE_ORACLE = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS is_boundary
  FROM events WHERE event_type <> 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts,
         sum(is_boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS island
  FROM base
), islands AS (
  SELECT user_id, island, min(ts) AS valid_from, max(ts) AS valid_to,
         min(event_type) AS state
  FROM runs GROUP BY user_id, island
), purchases AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), attributed AS (
  SELECT p.p_id, p.cents, i.state,
         row_number() OVER (PARTITION BY p.p_id
                            ORDER BY i.valid_from DESC NULLS LAST,
                                     i.island DESC NULLS LAST) AS rn
  FROM purchases p
  LEFT JOIN islands i
    ON p.p_user = i.user_id AND p.p_ts >= i.valid_from AND p.p_ts <= i.valid_to
)
SELECT coalesce(state, 'none') AS state,
       CAST(count(*) AS BIGINT) AS n_purchases,
       sum(cents) / 100.0 AS purchase_value
FROM attributed
WHERE rn = 1
GROUP BY coalesce(state, 'none')
ORDER BY state
"""


# --------------------------------------------------------------------------
# Time-to-convert percentiles (first view → first purchase)
# --------------------------------------------------------------------------


def time_to_convert_stats(events: DataFrame) -> DataFrame:
    """How long does conversion take? Per converting user, minutes from
    FIRST view to the first purchase at-or-after it; reported as
    quartiles plus the converter count — the product-analytics latency
    twin of funnel_conversion's reach counts.

    Shape: two user-keyed conditional aggregates (first view, then first
    qualifying purchase via a user-cardinality join) — never an
    event-sized window; the percentile input is one row per converter.
    Minutes are floor(epoch-second delta / 60) — integer arithmetic in
    both engines, so quartile interpolation lands on .0/.25/.5/.75
    values computed bit-identically.
    """
    ev = events.select("user_id", "event_type", "ts")
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"), F.min("t_view").alias("t_view"))
        .select(
            F.floor(
                (
                    F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
                )
                / 60
            )
            .cast("long")
            .alias("minutes")
        )
    )
    return conv.agg(
        F.count("*").cast("long").alias("n_converters"),
        F.expr("percentile(minutes, 0.25)").alias("p25_min"),
        F.expr("percentile(minutes, 0.50)").alias("median_min"),
        F.expr("percentile(minutes, 0.75)").alias("p75_min"),
    )


TIME_TO_CONVERT_ORACLE = """
WITH first_view AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT e.user_id,
         CAST(floor(date_diff('second', min(v.t_view), min(e.ts)) / 60.0)
              AS BIGINT) AS minutes
  FROM events e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.t_view
  GROUP BY e.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converters,
       quantile_cont(minutes, 0.25) AS p25_min,
       quantile_cont(minutes, 0.50) AS median_min,
       quantile_cont(minutes, 0.75) AS p75_min
FROM conv
"""


def time_weighted_value(events: DataFrame) -> DataFrame:
    """Per-type TIME-WEIGHTED average event value — the TWAP/duration-
    weighted mean: each event's value holds until the user's next event,
    so it contributes weight = its interval length in whole seconds. The
    plain mean treats a 1-second and a 3-day reading identically; the
    duration-weighted mean is the correct aggregate for state-like
    readings (sensor values, prices, session quality).

    Shape: one user-keyed lead() window (the event_gap_detection
    machinery — per-user timeline, second-truncated deltas), then one
    hash aggregate on event_type with map-side combine. Each user's last
    event has no interval and drops out; zero-length intervals carry
    zero weight and are filtered so a type whose every interval is
    zero-length cannot divide by zero.

    Exactness: value is 3dp → 1e-3-scaled BIGINT; weights are integer
    seconds; Σ(millis·secs) and Σ(secs) are exact BIGINTs and the 4dp
    mean rounds by half-up integer division (round(10·Σwv/Σs)) — the
    engine-wide tie discipline.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        events.select(
            "user_id",
            "event_id",
            "event_type",
            "ts",
            F.round(F.col("value") * 1000).cast("long").alias("mv"),
        )
        .withColumn(
            "dur_s",
            F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts"),
        )
        .where(F.col("dur_s") > 0)
    )
    return (
        iv.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dur_s").alias("total_seconds"),
            F.sum(F.col("mv") * F.col("dur_s")).alias("wv"),
        )
        .select(
            "event_type",
            "n_intervals",
            "total_seconds",
            (
                F.expr("(20 * wv + total_seconds) div (2 * total_seconds)")
                / 10000.0
            ).alias("twap_value"),
        )
        .orderBy("event_type")
    )


TIME_WEIGHTED_VALUE_ORACLE = """
WITH iv AS (
  SELECT event_type,
         CAST(round(value * 1000) AS BIGINT) AS mv,
         date_diff('second', ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)) AS dur_s
  FROM events
)
SELECT event_type,
       count(*) AS n_intervals,
       CAST(sum(dur_s) AS BIGINT) AS total_seconds,
       ((20 * CAST(sum(mv * dur_s) AS BIGINT) + CAST(sum(dur_s) AS BIGINT))
        // (2 * CAST(sum(dur_s) AS BIGINT))) / 10000.0 AS twap_value
FROM iv
WHERE dur_s > 0
GROUP BY event_type
ORDER BY event_type
"""
