"""Warehouse-completeness queries: SCD2 dimension build, pivot,
decile analysis, funnel sequencing, and calendar gap-fill.

These are the remaining classic warehouse shapes a user migrating an
analytics workload expects from an engine (SURVEY §2.6 notes the
reference has no SQL surface at all — window functions, pivots, and
set-based history tracking are all driver-added capabilities). Every
query is expression-native (window functions + hash aggregates, no
Python in the hot path) and oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources import load_table


# --------------------------------------------------------------------------
# SCD2 (type-2 slowly changing dimension) build
# --------------------------------------------------------------------------


def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 dimension of each user's event-type "status"
    history from the raw event stream: consecutive duplicates collapse,
    each surviving change gets ``valid_from``/``valid_to`` (NULL = the
    current row) and a version number.

    The standard warehouse history-tracking shape: one
    ``lag``-to-detect-change window + one ``lead``-for-interval window,
    both over the same (user, time) partitioning, so the whole build is
    a single shuffle on user_id regardless of history length. At scale
    the dimension lands in a keyed store and new events extend it
    incrementally with the same expressions inside a MERGE.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("status")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.withColumn("prev", F.lag("status").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            "status",
            F.unix_millis("ts").alias("valid_from_ms"),
            F.unix_millis(F.lead("ts").over(w2)).alias("valid_to_ms"),
            F.row_number().over(w2).alias("version"),
        )
        .orderBy("user_id", "version")
    )


SCD2_SQL = """
WITH changes AS (
    SELECT user_id, ts, event_id, event_type AS status
    FROM (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id,
       status,
       epoch_ms(ts) AS valid_from_ms,
       epoch_ms(lead(ts) OVER w2) AS valid_to_ms,
       row_number() OVER w2 AS version
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
"""


# --------------------------------------------------------------------------
# pivot (nation × order-year revenue matrix)
# --------------------------------------------------------------------------

_PIVOT_YEARS = tuple(range(1992, 1999))


def revenue_pivot_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue pivoted to one column per order year, one row per
    customer nation — ``groupBy().pivot()`` with the year list given
    EXPLICITLY: Spark otherwise runs an extra distinct-scan job to
    discover the pivot values, and the output column order would
    depend on data. Explicit values keep the plan to one scan + one
    shuffle and the schema static, which is also what the oracle's
    conditional aggregation reproduces."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            "o_totalprice",
        )
    )
    pivoted = (
        joined.groupBy("n_name")
        .pivot("yr", list(_PIVOT_YEARS))
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renamed = pivoted.select(
        "n_name",
        *[F.col(str(y)).alias(f"y{y}") for y in _PIVOT_YEARS],
    )
    return renamed.orderBy("n_name")


REVENUE_PIVOT_SQL = (
    "SELECT n_name,\n"
    + ",\n".join(
        f"       round(sum(o_totalprice) FILTER (year(o_orderdate) = {y}),"
        f" 2) AS y{y}"
        for y in _PIVOT_YEARS
    )
    + """
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""
)


# --------------------------------------------------------------------------
# decile analysis (ntile / distribution windows)
# --------------------------------------------------------------------------


def customer_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ranked into revenue deciles (ntile over total spend,
    ties broken by key for determinism), then per-decile summary — the
    standard cohort/LTV segmentation shape. Two shuffles total: the
    per-customer aggregate, then the decile assignment; the ntile
    window is a single global ordering, which at 100 TB becomes a
    range-partitioned sort (Spark plans exactly that) rather than a
    single-partition bottleneck only if the per-customer relation is
    still large — here it is customers, already 1/30th of orders."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_custkey"))
    deciled = per_cust.withColumn("decile", F.ntile(10).over(w))
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.round(F.sum("revenue"), 2).alias("total_revenue"),
            F.round(F.min("revenue"), 2).alias("min_revenue"),
            F.round(F.max("revenue"), 2).alias("max_revenue"),
        )
        .orderBy("decile")
    )


REVENUE_DECILES_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
), deciled AS (
    SELECT *,
           ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
    FROM per_cust
)
SELECT decile,
       count(*) AS n_customers,
       sum(n_orders)::BIGINT AS n_orders,
       round(sum(revenue), 2) AS total_revenue,
       round(min(revenue), 2) AS min_revenue,
       round(max(revenue), 2) AS max_revenue
FROM deciled
GROUP BY decile
ORDER BY decile
"""


# --------------------------------------------------------------------------
# funnel sequencing (ordered multi-step conversion)
# --------------------------------------------------------------------------


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel per user: each stage's
    timestamp must follow the previous stage's (a click before the
    first view does not count). Three bounded aggregates, each joined
    back broadcast (the per-user relation is keys, not events); no
    self-join of the event table against itself. Users who never
    viewed are excluded; later stages are NULL where the funnel
    stalls."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    # each stage frame is per-user (tiny) but feeds BOTH the next
    # stage's gate and the final join — persist so the event scan
    # behind it runs once, not once per consumer (explain showed the
    # view aggregate's scan replicated 3x without this)
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_millis("view_ts").alias("first_view_ms"),
            F.unix_millis("click_ts").alias("first_click_after_ms"),
            F.unix_millis("purchase_ts").alias("first_purchase_after_ms"),
        )
        .orderBy("user_id")
    )


EVENT_FUNNEL_SQL = """
WITH v AS (
    SELECT user_id, min(ts) AS view_ts
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS click_ts
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.view_ts
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS purchase_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
    GROUP BY e.user_id
)
SELECT v.user_id,
       epoch_ms(view_ts) AS first_view_ms,
       epoch_ms(click_ts) AS first_click_after_ms,
       epoch_ms(purchase_ts) AS first_purchase_after_ms
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""


# --------------------------------------------------------------------------
# calendar gap-fill (resample + cumulative)
# --------------------------------------------------------------------------


def daily_activity_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily event counts with MISSING days zero-filled from a
    generated calendar spine, plus a per-user running total — the
    time-series resample shape dashboards and feature pipelines need
    (a groupBy alone silently omits empty buckets).

    The spine is users × days built with ``sequence`` + ``explode``
    from a one-row min/max aggregate — rows generated, not stored, and
    the explode is partition-parallel. The left join back to the
    day-aggregated facts is a shuffle of (users × days) rows, which is
    the OUTPUT size — no plan reads the raw events more than once."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = events.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    users = events.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
        .withColumn("cum_events", F.sum("n_events").over(w))
        .select(
            "user_id",
            F.unix_date("day").alias("day_num"),
            "n_events",
            "cum_events",
        )
        .orderBy("user_id", "day_num")
    )


GAP_FILL_SQL = """
WITH bounds AS (
    SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events
), spine AS (
    SELECT u.user_id, s.day::DATE AS day
    FROM (SELECT DISTINCT user_id FROM events) u,
         bounds,
         unnest(generate_series(bounds.d0, bounds.d1,
                                INTERVAL 1 DAY)) AS s(day)
), daily AS (
    SELECT user_id, ts::DATE AS day, count(*) AS n_events
    FROM events
    GROUP BY 1, 2
)
SELECT s.user_id,
       date_diff('day', DATE '1970-01-01', s.day) AS day_num,
       coalesce(d.n_events, 0) AS n_events,
       (sum(coalesce(d.n_events, 0))
           OVER (PARTITION BY s.user_id ORDER BY s.day))::BIGINT AS cum_events
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
ORDER BY s.user_id, day_num
"""


# --------------------------------------------------------------------------
# point-in-time dimension lookup (temporal join against SCD2 intervals)
# --------------------------------------------------------------------------


def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the user's activity status AT that moment
    — the temporal-dimension lookup every SCD2 dimension exists to
    serve. The dimension is the status history built from the NON-error
    events; the fact side is the errors.

    Plan: because SCD2 intervals are contiguous per key, the interval
    join ``valid_from <= ts < valid_to`` is exactly an as-of join on
    ``valid_from`` — so this reuses ``operators.asof.asof_join``'s
    union trick: ONE shuffle on user_id and a linear window pass,
    versus the naive range join the oracle runs (which explodes the
    (fact × dim-rows-per-user) product before pruning). The oracle
    checking equality IS the proof the rewrite is semantics-preserving.

    Changes are deduplicated to one per (user, instant) keeping the
    highest event_id ("final status at that instant") so the as-of
    carry is deterministic under equal timestamps.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.filter(F.col("event_type") != "error")
        .select(
            "user_id", "ts", "event_id",
            F.col("event_type").alias("status"),
        )
        .withColumn("prev", F.lag("status").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "status")).alias("_last"))
        .select(
            "user_id",
            "ts",
            F.col("_last.status").alias("status"),
            F.unix_millis("ts").alias("status_since_ms"),
        )
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    from ..operators.asof import asof_join

    joined = asof_join(
        errors,
        changes,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["status", "status_since_ms"],
        strict=False,
        suffix="",
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        F.unix_millis("ts").alias("error_ts_ms"),
        F.col("status").alias("status_at_error"),
        "status_since_ms",
    ).orderBy("user_id", "error_event_id")


SCD2_POINT_IN_TIME_SQL = """
WITH collapsed AS (
    SELECT user_id, ts, event_id, event_type AS status
    FROM (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev
        FROM events
        WHERE event_type <> 'error'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE prev IS NULL OR prev <> event_type
), changes AS (
    SELECT user_id, ts,
           max_by(status, event_id) AS status,
           epoch_ms(ts) AS status_since_ms
    FROM collapsed
    GROUP BY user_id, ts
), intervals AS (
    SELECT user_id, ts AS valid_from, status, status_since_ms,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
    FROM changes
)
SELECT e.user_id,
       e.event_id AS error_event_id,
       epoch_ms(e.ts) AS error_ts_ms,
       i.status AS status_at_error,
       i.status_since_ms
FROM events e
LEFT JOIN intervals i
  ON e.user_id = i.user_id
 AND i.valid_from <= e.ts
 AND (i.valid_to IS NULL OR e.ts < i.valid_to)
WHERE e.event_type = 'error'
ORDER BY e.user_id, error_event_id
"""


# --------------------------------------------------------------------------
# cohort retention matrix
# --------------------------------------------------------------------------


def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic product-analytics cohort matrix: users grouped by
    first-active week, tracked by how many are active N weeks later.
    Two aggregates (first-seen per user, active user-weeks) joined on
    the user key — the cohort assignment broadcasts because it is one
    row per user, already reduced from the event volume. Week index is
    integer arithmetic on epoch days, identical in both engines."""
    events = load_table(spark, sf_dir, "events")
    weekly = events.select(
        "user_id", (F.unix_date(F.to_date("ts")) / 7).cast("long").alias("week")
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(F.broadcast(cohorts), "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


WEEKLY_RETENTION_SQL = """
WITH weekly AS (
    SELECT DISTINCT user_id,
           date_diff('day', DATE '1970-01-01', ts::DATE) // 7 AS week
    FROM events
), cohorts AS (
    SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
)
SELECT c.cohort_week,
       w.week - c.cohort_week AS weeks_since,
       count(DISTINCT w.user_id) AS n_active
FROM weekly w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY 1, 2
ORDER BY cohort_week, weeks_since
"""


# --------------------------------------------------------------------------
# rolling z-score anomaly detection
# --------------------------------------------------------------------------

_Z_WINDOW = 7  # trailing days
_Z_THRESHOLD = 2.0


def daily_anomaly_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose event volume deviates from the trailing 7-day mean by
    more than 2 sample standard deviations — the rolling z-score
    monitor every ingestion pipeline runs. One aggregate to daily
    grain, then a single ordered window per metric (here: global daily
    counts, so the window is one tiny partition; per-key monitors
    partition by the key and scale out). The frame EXCLUDES the
    current day (trailing stats), so an anomaly cannot suppress
    itself."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    scored = daily.select(
        F.unix_date("day").alias("day_num"),
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.round(F.avg("n_events").over(w), 6).alias("trailing_mean"),
        F.round(F.stddev_samp("n_events").over(w), 6).alias("trailing_std"),
    ).filter(F.col("n_trailing") == _Z_WINDOW)
    z = F.round(
        (F.col("n_events") - F.col("trailing_mean"))
        / F.col("trailing_std"),
        6,
    )
    return (
        scored.select(
            "day_num",
            "n_events",
            "trailing_mean",
            "trailing_std",
            z.alias("zscore"),
            (F.abs(z) > _Z_THRESHOLD).alias("is_anomaly"),
        )
        .orderBy("day_num")
    )


ANOMALY_ZSCORES_SQL = f"""
WITH daily AS (
    SELECT ts::DATE AS day, count(*) AS n_events
    FROM events
    GROUP BY 1
), scored AS (
    SELECT date_diff('day', DATE '1970-01-01', day) AS day_num,
           n_events,
           count(*) OVER w AS n_trailing,
           round(avg(n_events) OVER w, 6) AS trailing_mean,
           round(stddev_samp(n_events) OVER w, 6) AS trailing_std
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN {_Z_WINDOW} PRECEDING
                 AND 1 PRECEDING)
)
SELECT day_num,
       n_events,
       trailing_mean,
       trailing_std,
       round((n_events - trailing_mean) / trailing_std, 6) AS zscore,
       abs(round((n_events - trailing_mean) / trailing_std, 6))
           > {_Z_THRESHOLD} AS is_anomaly
FROM scored
WHERE n_trailing = {_Z_WINDOW}
ORDER BY day_num
"""


# --------------------------------------------------------------------------
# histogram (width-bucket binned aggregation)
# --------------------------------------------------------------------------

_HIST_BUCKET = 10_000.0


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price histogram at a fixed bucket width — binning is a
    scan-stage projection (floor division), so the whole histogram is
    one map-side-combinable aggregate; no sort, no window."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(_HIST_BUCKET)).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .withColumn("bucket_low", F.col("bucket") * _HIST_BUCKET)
        .drop("bucket")
        .orderBy("bucket_low")
    )


PRICE_HISTOGRAM_SQL = f"""
SELECT count(*) AS n_orders,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       floor(o_totalprice / {_HIST_BUCKET}) * {_HIST_BUCKET} AS bucket_low
FROM orders
GROUP BY floor(o_totalprice / {_HIST_BUCKET})
ORDER BY bucket_low
"""


def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution in weekly buckets, per
    linestatus — the fulfillment-SLA profile. The latency is a
    scan-stage datediff against the broadcast-joined order date, so
    the histogram is one fact scan + one map-side-combinable aggregate
    (orders is the smaller side and broadcasts; lineitem never
    shuffles for the join)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    lat_days = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_linestatus",
            F.floor(lat_days / 7).cast("long").alias("latency_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min(lat_days).alias("min_days"),
            F.max(lat_days).alias("max_days"),
        )
        .orderBy("l_linestatus", "latency_week")
    )


SHIP_LATENCY_SQL = """
SELECT l_linestatus,
       CAST(floor(date_diff('day', o_orderdate, l_shipdate) / 7.0)
            AS BIGINT)                                    AS latency_week,
       count(*)                                           AS n_lines,
       min(date_diff('day', o_orderdate, l_shipdate))     AS min_days,
       max(date_diff('day', o_orderdate, l_shipdate))     AS max_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY l_linestatus, latency_week
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts and probabilities —
    the sequence-analytics pass behind behavior models and funnels.

    One window (lag over the per-user event order — the same keyed
    shuffle every sequence feature shares) pairs each event with its
    predecessor; transition counts are a tiny |types|² aggregate, and
    the row-normalized probabilities ride a second window over that
    dimension-sized relation. Determinism: ties in event order break
    on event_id, probabilities round before output.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_total = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(row_total),
            6,
        ).alias("p_transition"),
    ).orderBy("from_type", "to_type")


TRANSITION_MATRIX_SQL = """
WITH pairs AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS from_type,
           event_type AS to_type
    FROM events
), counted AS (
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM pairs WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       round(n_transitions::DOUBLE
             / sum(n_transitions) OVER (PARTITION BY from_type), 6)
           AS p_transition
FROM counted
ORDER BY from_type, to_type
"""


QUERIES = {
    "ship_latency_histogram": ship_latency_histogram,
    "event_transition_matrix": event_transition_matrix,
    "scd2_user_status": scd2_user_status,
    "scd2_point_in_time": scd2_point_in_time,
    "weekly_retention": weekly_retention,
    "daily_anomaly_zscores": daily_anomaly_zscores,
    "price_histogram": price_histogram,
    "revenue_pivot_by_year": revenue_pivot_by_year,
    "customer_revenue_deciles": customer_revenue_deciles,
    "event_funnel": event_funnel,
    "daily_activity_gap_fill": daily_activity_gap_fill,
}

ORACLES = {
    "ship_latency_histogram": SHIP_LATENCY_SQL,
    "event_transition_matrix": TRANSITION_MATRIX_SQL,
    "scd2_user_status": SCD2_SQL,
    "scd2_point_in_time": SCD2_POINT_IN_TIME_SQL,
    "weekly_retention": WEEKLY_RETENTION_SQL,
    "daily_anomaly_zscores": ANOMALY_ZSCORES_SQL,
    "price_histogram": PRICE_HISTOGRAM_SQL,
    "revenue_pivot_by_year": REVENUE_PIVOT_SQL,
    "customer_revenue_deciles": REVENUE_DECILES_SQL,
    "event_funnel": EVENT_FUNNEL_SQL,
    "daily_activity_gap_fill": GAP_FILL_SQL,
}


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — the BI classic: users grouped by first-active
    day (the events table spans days, so daily cohorts), then for each
    (cohort, day-offset) the share of the cohort still active. One
    aggregate to first-activity, one distinct-activity aggregate, one
    broadcast-joined ratio — all map-side combinable; the matrix is
    dimension-sized (days x offsets)."""
    events = load_table(spark, sf_dir, "events")
    acts = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    first = acts.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = acts.join(first, "user_id").select(
        "user_id",
        F.unix_millis("cohort_day").alias("cohort_ms"),
        F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
    )
    cohort_sizes = first.groupBy(
        F.unix_millis("cohort_day").alias("cohort_ms")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    cells = joined.groupBy("cohort_ms", "day_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    return (
        cells.join(F.broadcast(cohort_sizes), "cohort_ms")
        .select(
            "cohort_ms",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_ms", "day_offset")
    )


RETENTION_SQL = """
WITH acts AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
first AS (
    SELECT user_id, min(day) AS cohort_day FROM acts GROUP BY user_id
),
sizes AS (
    SELECT epoch_ms(cohort_day) AS cohort_ms, count(*) AS cohort_size
    FROM first GROUP BY 1
),
cells AS (
    SELECT epoch_ms(f.cohort_day) AS cohort_ms,
           date_diff('day', f.cohort_day, a.day) AS day_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM acts a JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT c.cohort_ms,
       c.day_offset::INT AS day_offset,
       c.n_active,
       s.cohort_size,
       round(c.n_active::DOUBLE / s.cohort_size, 6) AS retention
FROM cells c JOIN sizes s USING (cohort_ms)
ORDER BY cohort_ms, day_offset
"""

QUERIES["user_retention_cohorts"] = user_retention_cohorts
ORACLES["user_retention_cohorts"] = RETENTION_SQL


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency / frequency / monetary
    quintiles (ntile over deterministically tie-broken orderings),
    reported as the segment-cell matrix with counts and average spend.
    One per-customer aggregate, three windows over the customer
    dimension, one dimension-sized (<=125 cells) report."""
    orders = load_table(spark, sf_dir, "orders")
    max_date = orders.agg(F.max("o_orderdate")).collect()[0][0]
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(max_date), F.max("o_orderdate")).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        # integer cents: exact ntile ordering and exact cell averages
        # (a rounded-dollar double can land on a half-cent boundary and
        # flip between engines)
        F.round(F.sum("o_totalprice") * 100).cast("long").alias(
            "monetary_cents"
        ),
    )
    w_r = Window.orderBy("recency_days", "o_custkey")
    w_f = Window.orderBy(F.desc("frequency"), "o_custkey")
    w_m = Window.orderBy(F.desc("monetary_cents"), "o_custkey")
    scored = per_cust.select(
        "o_custkey",
        "monetary_cents",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary_cents") / 100, 4).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           date_diff('day', max(o_orderdate),
                     (SELECT max(o_orderdate) FROM orders)) AS recency_days,
           count(*) AS frequency,
           round(sum(o_totalprice) * 100)::BIGINT AS monetary_cents
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey, monetary_cents,
           ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
           ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
    FROM per_cust
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       round(avg(monetary_cents) / 100, 4) AS avg_monetary
FROM scored
GROUP BY 1, 2, 3
ORDER BY r_score, f_score, m_score
"""

QUERIES["rfm_segments"] = rfm_segments
ORACLES["rfm_segments"] = RFM_SQL


def revenue_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly revenue OLS trend (slope in dollars/month).

    The classic "is this market growing?" report: monthly revenue per
    customer nation, least-squares slope over the month index. The
    slope is computed from INTEGER moments — x = months-since-epoch,
    y = revenue cents, slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) — so
    the distributed sums are exact whole numbers in any addition order
    and the single floating division is engine-identical (a direct
    ``regr_slope`` would accumulate doubles in engine-specific order).

    Scale posture: one fact shuffle to the (nation, month) grain
    (map-side combinable), then the moment aggregate runs on the
    dimension-sized series; the nation dim broadcasts into the first
    join. Intermediates fit long arithmetic: at 100 TB, month-cents
    sums stay < 2^56 per nation-month and n*Sxy < 2^63 for any
    realistic calendar span.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(
            F.broadcast(
                customer.select("c_custkey", "c_nationkey")
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            "c_nationkey",
            (
                (F.year("o_orderdate") - 1970) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("x"),
        )
        .agg(
            F.round(F.sum("o_totalprice") * 100)
            .cast("long")
            .alias("y_cents")
        )
    )
    moments = monthly.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("x") * F.col("y_cents")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        moments.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            moments.c_nationkey == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_months",
            F.round(
                (
                    F.col("n_months") * F.col("sxy")
                    - F.col("sx") * F.col("sy")
                ).cast("double")
                / (
                    F.col("n_months") * F.col("sxx")
                    - F.col("sx") * F.col("sx")
                )
                / 100.0,
                6,
            ).alias("slope_per_month"),
            F.round(F.col("sy") / F.col("n_months") / 100.0, 4).alias(
                "avg_monthly_revenue"
            ),
        )
        .orderBy("n_name")
    )


TREND_SQL = """
WITH monthly AS (
    SELECT c.c_nationkey,
           (year(o.o_orderdate) - 1970) * 12 + month(o.o_orderdate) - 1 AS x,
           round(sum(o.o_totalprice) * 100)::BIGINT AS y_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
moments AS (
    SELECT c_nationkey,
           count(*)::BIGINT AS n_months,
           sum(x)::BIGINT AS sx,
           sum(y_cents)::BIGINT AS sy,
           sum(x * y_cents)::BIGINT AS sxy,
           sum(x * x)::BIGINT AS sxx
    FROM monthly GROUP BY c_nationkey
)
SELECT n.n_name,
       m.n_months,
       round((m.n_months * m.sxy - m.sx * m.sy)::DOUBLE
             / (m.n_months * m.sxx - m.sx * m.sx) / 100.0, 6) AS slope_per_month,
       round(m.sy::DOUBLE / m.n_months / 100.0, 4) AS avg_monthly_revenue
FROM moments m JOIN nation n ON m.c_nationkey = n.n_nationkey
ORDER BY n.n_name
"""

QUERIES["revenue_trend_slopes"] = revenue_trend_slopes
ORACLES["revenue_trend_slopes"] = TREND_SQL


_BUCKETS = 8


def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free big-big join via bucketed tables (SMB join).

    The one big-big join strategy the suite had not yet demonstrated:
    both fact tables are written ``bucketBy(N, key).sortBy(key)`` into
    the session warehouse, after which the orderkey join needs NO
    exchange and NO sort on either side — each task zips bucket i of
    one table with bucket i of the other. This is how a production
    pipeline amortizes the shuffle of its hottest join across every
    downstream consumer: pay hash-partitioning once at write time,
    join co-located forever after. The ``merge`` hint pins the
    sort-merge path so the demo does not degrade to a broadcast at
    toy scale; the no-exchange/no-sort invariant is asserted in
    tests/test_plan_shape.py.

    Revenue is per-row integer cents, so the aggregate is exact in any
    order. The write targets the session warehouse (driver-local tmp),
    overwritten per call — at real scale the bucketed tables ARE the
    curated warehouse copy.
    """
    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.split("/")[-1])
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("rev_cents"),
    )
    ot, lt = f"ord_bkt_{tag}", f"li_bkt_{tag}"
    # A fresh session's in-memory catalog does not know tables a prior
    # session left in the warehouse directory, and saveAsTable refuses
    # an existing orphaned location — drop both layers explicitly.
    import os
    import shutil
    from urllib.parse import urlparse

    wh_dir = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name in (ot, lt):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(os.path.join(wh_dir, name), ignore_errors=True)
    # repartition on the bucket key first: one file per bucket, so the
    # scan honors the written sort order and the SMJ needs no re-sort
    # (with multiple files per bucket Spark must re-sort each side).
    (
        orders.repartition(_BUCKETS, "o_orderkey")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ot)
    )
    (
        lineitem.repartition(_BUCKETS, "l_orderkey")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(lt)
    )
    # Propagate the written per-bucket sort order into the scan (off by
    # default since Spark 3.0; safe here because the repartition above
    # guarantees one file per bucket, the case the conf exists for).
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    return (
        spark.table(ot)
        .hint("merge")
        .join(
            spark.table(lt),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_cents").alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o.o_orderpriority,
       count(*) AS n_items,
       sum(round(l.l_extendedprice * (1 - l.l_discount) * 100)::BIGINT)::BIGINT
           AS revenue_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

QUERIES["bucketed_colocated_join"] = bucketed_colocated_join
ORACLES["bucketed_colocated_join"] = BUCKETED_JOIN_SQL


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts on the (cheap, small) Pareto frontier.

    A part is on the frontier iff no other part is <= on both price
    and size with one strict. Rather than the O(n^2) dominance
    self-join, the 2-D skyline reduces to: (1) per-price minimum size
    — a map-side-combinable aggregate that collapses the fact table to
    the DISTINCT-PRICE domain; (2) one window over that tiny relation
    ordered by price, keeping prices whose best size beats the running
    minimum of all strictly-cheaper prices; (3) a join back to emit the
    winning parts (ties on (price, size) are mutually non-dominating
    and all kept). Prices are integer cents so ordering and equality
    are engine-exact.

    Scale posture: one aggregate shuffle keyed by price + a window over
    the distinct-price relation (bounded domain, broadcastable) + one
    semi-join back — no pairwise comparison ever materializes.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    per_price = part.groupBy("price_cents").agg(
        F.min("p_size").alias("best_size")
    )
    w = (
        Window.orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_prices = (
        per_price.withColumn("run_min", F.min("best_size").over(w))
        .filter(
            F.col("run_min").isNull()
            | (F.col("best_size") < F.col("run_min"))
        )
        .select("price_cents", "best_size")
    )
    return (
        part.alias("p")
        .join(
            F.broadcast(frontier_prices.alias("f")),
            (F.col("p.price_cents") == F.col("f.price_cents"))
            & (F.col("p.p_size") == F.col("f.best_size")),
        )
        .select(
            "p.p_partkey",
            "p.p_brand",
            "p.p_size",
            F.round(F.col("p.price_cents") / 100.0, 2).alias("price"),
        )
        .orderBy("price", "p_partkey")
    )


PARETO_SQL = """
WITH p AS (
    SELECT p_partkey, p_brand, p_size,
           round(p_retailprice * 100)::BIGINT AS price_cents
    FROM part
),
per_price AS (
    SELECT price_cents, min(p_size) AS best_size
    FROM p GROUP BY price_cents
),
frontier AS (
    SELECT price_cents, best_size
    FROM (SELECT price_cents, best_size,
                 min(best_size) OVER (ORDER BY price_cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS run_min
          FROM per_price)
    WHERE run_min IS NULL OR best_size < run_min
)
SELECT p.p_partkey, p.p_brand, p.p_size,
       round(p.price_cents / 100.0, 2) AS price
FROM p JOIN frontier f
  ON p.price_cents = f.price_cents AND p.p_size = f.best_size
ORDER BY price, p.p_partkey
"""

QUERIES["pareto_frontier_parts"] = pareto_frontier_parts
ORACLES["pareto_frontier_parts"] = PARETO_SQL


# --------------------------------------------------------------------------
# Small-file compaction planning + zone-map pruning effectiveness —
# the table-maintenance layer a 100 TB warehouse runs nightly. The file
# inventory is synthesized deterministically from lineitem (month
# partition x suppkey-hash file, bytes proportional to row count) so
# the oracle can restate the whole plan in SQL; on a real lakehouse the
# same two queries run over the table's file-manifest listing instead.
# --------------------------------------------------------------------------


_COMPACTION_TARGET_BYTES = 32 * 1024  # target output size per compacted file
_FILE_ROW_BYTES = 96  # synthetic bytes-per-row for the inventory


def _file_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("part_key"),
        (F.col("l_suppkey") % 8).alias("file_id"),
    ).agg(
        (F.count(F.lit(1)) * _FILE_ROW_BYTES).alias("size_bytes"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: sequential bin-packing of each
    partition's files (largest first, file_id as the deterministic
    tie-break) into ~target-size output groups via a running-sum window
    — ``group = (cumulative_bytes - 1) div target``. Integer
    arithmetic throughout so the plan is engine-exact and stable at
    any scale; the window shuffles once on the partition key, which is
    exactly the parallelism of the rewrite job that consumes the plan
    (one task per date partition, no cross-partition coordination —
    this is why compaction of a 100 TB table is embarrassingly
    parallel)."""
    return compaction_plan_from_inventory(_file_inventory(spark, sf_dir))


def compaction_plan_from_inventory(files: DataFrame) -> DataFrame:
    """The bin-packing windows over any (part_key, file_id, size_bytes)
    inventory — shared by the batch query above and the streaming
    maintained-inventory twin (``stream_compaction_plan``), whose state
    equals the batch inventory by the fold monoids."""
    planned = files.select(
        "part_key",
        "file_id",
        "size_bytes",
        F.expr(
            f"CAST((sum(size_bytes) OVER (PARTITION BY part_key "
            f"ORDER BY size_bytes DESC, file_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) "
            f"DIV {_COMPACTION_TARGET_BYTES} AS INT)"
        ).alias("out_group"),
    )
    wg = Window.partitionBy("part_key", "out_group")
    return planned.select(
        "part_key",
        "file_id",
        "size_bytes",
        "out_group",
        F.sum("size_bytes").over(wg).alias("group_bytes"),
        F.count(F.lit(1)).over(wg).cast("int").alias("files_in_group"),
    ).orderBy("part_key", "file_id")


COMPACTION_PLAN_SQL = f"""
WITH files AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS part_key,
           l_suppkey % 8 AS file_id,
           {_FILE_ROW_BYTES} * COUNT(*) AS size_bytes
    FROM lineitem
    GROUP BY 1, 2
), planned AS (
    SELECT part_key, file_id, size_bytes,
           CAST((SUM(size_bytes) OVER (PARTITION BY part_key
                 ORDER BY size_bytes DESC, file_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                // {_COMPACTION_TARGET_BYTES} AS INT) AS out_group
    FROM files
)
SELECT part_key, file_id, size_bytes, out_group,
       CAST(SUM(size_bytes) OVER (PARTITION BY part_key, out_group) AS BIGINT)
           AS group_bytes,
       CAST(COUNT(*) OVER (PARTITION BY part_key, out_group) AS INT)
           AS files_in_group
FROM planned
ORDER BY part_key, file_id
"""

QUERIES["compaction_plan"] = compaction_plan
ORACLES["compaction_plan"] = COMPACTION_PLAN_SQL


_VACUUM_RETAIN = 3  # snapshots kept per partition beyond the current one


def vacuum_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum plan over a versioned-file inventory — the third leg of
    the table-maintenance triad beside compaction_plan and
    zone_map_pruning_report (Delta VACUUM / Iceberg expire_snapshots):
    per partition, versions older than the newest ``_VACUUM_RETAIN``
    are reclaimable; the plan lists every version with its file count,
    bytes, eligibility, and the partition's reclaimable totals — the
    artifact the delete job consumes and the audit log keeps.

    Inventory synthesis follows the compaction/zone-map convention
    (month partition, suppkey-derived file id; version = orderkey mod
    6 models successive snapshot writes). Plan shape: one
    map-side-combinable aggregate to the (partition, version) grain,
    then windows over the version-count-sized relation — the rewrite
    parallelism is per-partition, same as compaction."""
    li = load_table(spark, sf_dir, "lineitem")
    inv = (
        li.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("part_key"),
            (F.col("l_orderkey") % 6).cast("int").alias("version"),
            (F.col("l_suppkey") % 8).alias("file_id"),
        )
        .groupBy("part_key", "version")
        .agg(
            F.countDistinct("file_id").cast("int").alias("n_files"),
            (F.count(F.lit(1)) * _FILE_ROW_BYTES).alias("size_bytes"),
        )
    )
    wp = Window.partitionBy("part_key")
    flagged = inv.select(
        "part_key",
        "version",
        "n_files",
        "size_bytes",
        (
            F.col("version")
            <= F.max("version").over(wp) - F.lit(_VACUUM_RETAIN)
        ).alias("reclaimable"),
    )
    return flagged.select(
        "part_key",
        "version",
        "n_files",
        "size_bytes",
        "reclaimable",
        F.sum(
            F.when(F.col("reclaimable"), F.col("size_bytes")).otherwise(
                F.lit(0)
            )
        )
        .over(wp)
        .alias("part_reclaim_bytes"),
        F.sum(F.when(F.col("reclaimable"), 1).otherwise(0))
        .over(wp)
        .cast("int")
        .alias("part_reclaim_versions"),
    ).orderBy("part_key", "version")


VACUUM_PLAN_SQL = f"""
WITH inv AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS part_key,
           (l_orderkey % 6)::INT AS version,
           count(DISTINCT l_suppkey % 8)::INT AS n_files,
           {_FILE_ROW_BYTES} * count(*) AS size_bytes
    FROM lineitem
    GROUP BY 1, 2
), flagged AS (
    SELECT part_key, version, n_files, size_bytes,
           version <= max(version) OVER (PARTITION BY part_key)
                       - {_VACUUM_RETAIN} AS reclaimable
    FROM inv
)
SELECT part_key, version, n_files, size_bytes, reclaimable,
       sum(CASE WHEN reclaimable THEN size_bytes ELSE 0 END)
           OVER (PARTITION BY part_key)::BIGINT AS part_reclaim_bytes,
       sum(CASE WHEN reclaimable THEN 1 ELSE 0 END)
           OVER (PARTITION BY part_key)::INT AS part_reclaim_versions
FROM flagged
ORDER BY part_key, version
"""

QUERIES["vacuum_retention_plan"] = vacuum_retention_plan
ORACLES["vacuum_retention_plan"] = VACUUM_PLAN_SQL


_ZONE_LO, _ZONE_HI = 30000, 35000  # ~5%-selective price band probe


def zone_map_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max) pruning effectiveness, natural vs clustered
    layout — the measurement behind every data-skipping decision: for
    a band predicate on l_extendedprice, how many files (and bytes)
    does each layout let the scanner skip? 'natural' files are the
    suppkey-hashed inventory (price ranges span the domain, so zone
    maps are wide and nothing prunes); 'clustered' re-assigns each
    partition's rows to the same number of files with NTILE ordered by
    price (tight disjoint ranges — the effect a Z-order/cluster-by
    rewrite buys). The report quantifies the gap per partition; at
    100 TB this difference decides whether a point query reads 12 GB
    or 12 TB. One shuffle per layout (hash aggregate / window on the
    partition key); the verdict is pure plan-time arithmetic."""
    lineitem = load_table(spark, sf_dir, "lineitem")

    natural = _file_inventory(spark, sf_dir).select(
        F.lit("natural").alias("layout"),
        "part_key",
        "size_bytes",
        "min_price",
        "max_price",
    )

    wn = Window.partitionBy("pk").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    clustered = (
        lineitem.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("pk"),
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
        )
        .select("pk", "l_extendedprice", F.ntile(8).over(wn).alias("file_id"))
        .groupBy("pk", "file_id")
        .agg(
            (F.count(F.lit(1)) * _FILE_ROW_BYTES).alias("size_bytes"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .select(
            F.lit("clustered").alias("layout"),
            F.col("pk").alias("part_key"),
            "size_bytes",
            "min_price",
            "max_price",
        )
    )

    both = natural.unionByName(clustered)
    prunable = (F.col("max_price") < _ZONE_LO) | (F.col("min_price") > _ZONE_HI)
    return (
        both.select(
            "layout",
            "part_key",
            "size_bytes",
            prunable.cast("int").alias("pruned"),
        )
        .groupBy("layout", "part_key")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_files"),
            F.sum("pruned").cast("int").alias("n_pruned"),
            F.sum("size_bytes").alias("bytes_total"),
            F.sum(F.col("pruned") * F.col("size_bytes")).alias("bytes_skipped"),
        )
        .withColumn(
            "skip_ratio",
            F.round(F.col("bytes_skipped") / F.col("bytes_total"), 6),
        )
        .orderBy("layout", "part_key")
    )


ZONE_MAP_SQL = f"""
WITH natural_files AS (
    SELECT 'natural' AS layout,
           strftime(l_shipdate, '%Y-%m') AS part_key,
           {_FILE_ROW_BYTES} * COUNT(*) AS size_bytes,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY 2, l_suppkey % 8
), clustered_rows AS (
    SELECT strftime(l_shipdate, '%Y-%m') AS pk,
           l_extendedprice,
           NTILE(8) OVER (PARTITION BY strftime(l_shipdate, '%Y-%m')
                          ORDER BY l_extendedprice, l_orderkey,
                                   l_linenumber) AS file_id
    FROM lineitem
), clustered_files AS (
    SELECT 'clustered' AS layout,
           pk AS part_key,
           {_FILE_ROW_BYTES} * COUNT(*) AS size_bytes,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM clustered_rows
    GROUP BY pk, file_id
), both_layouts AS (
    SELECT * FROM natural_files UNION ALL SELECT * FROM clustered_files
), flagged AS (
    SELECT layout, part_key, size_bytes,
           CASE WHEN max_price < {_ZONE_LO} OR min_price > {_ZONE_HI}
                THEN 1 ELSE 0 END AS pruned
    FROM both_layouts
)
SELECT layout, part_key,
       CAST(COUNT(*) AS INT) AS n_files,
       CAST(SUM(pruned) AS INT) AS n_pruned,
       CAST(SUM(size_bytes) AS BIGINT) AS bytes_total,
       CAST(SUM(pruned * size_bytes) AS BIGINT) AS bytes_skipped,
       ROUND(CAST(SUM(pruned * size_bytes) AS DOUBLE)
             / SUM(size_bytes), 6) AS skip_ratio
FROM flagged
GROUP BY layout, part_key
ORDER BY layout, part_key
"""

QUERIES["zone_map_pruning_report"] = zone_map_pruning_report
ORACLES["zone_map_pruning_report"] = ZONE_MAP_SQL


# --------------------------------------------------------------------------
# Manifest-level partition pruning — the lakehouse trick that replaces
# directory-name pruning: a table manifest maps files to partition
# values, the PLANNER filters the manifest (a dimension-sized
# relation), and only the matching files are ever opened. This is how
# Iceberg/Delta prune a 100 TB table to the handful of files a
# date-band query needs, independent of physical directory layout.
# --------------------------------------------------------------------------

_MANIFEST_LO, _MANIFEST_HI = "1997-01", "1997-12"


def _manifest_staging(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent month-partitioned copy of lineitem + its manifest:
    one write per source-table CONTENT, re-used across calls (the
    staged table IS the warehouse copy; the manifest is derived by
    listing it). The cache tag fingerprints the source parquet
    (path + size + mtime), so regenerating a dataset in place gets a
    fresh staging instead of silently serving stale rows; the write
    lands in a per-process temp dir and is atomically renamed into
    place, so concurrent callers cannot corrupt each other (the race
    loser discards its copy)."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "lineitem.parquet")
    st = os.stat(src)
    tag = hashlib.sha1(
        f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.path.join(tempfile.gettempdir(), f"m4i_manifest_{tag}")
    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        tmp = f"{root}.tmp.{os.getpid()}"
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.select(
                F.date_format("l_shipdate", "yyyy-MM").alias("part_key"),
                F.round(F.col("l_extendedprice") * 100)
                .cast("long")
                .alias("price_cents"),
            )
            .repartition("part_key")
            .write.mode("overwrite")
            .partitionBy("part_key")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, root)
        except OSError:
            # a concurrent caller committed first; keep theirs
            shutil.rmtree(tmp, ignore_errors=True)
    return root


def manifest_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue for a one-year band, reading ONLY the files the
    manifest maps to that band: the manifest (file path -> partition
    value, a dimension-sized relation) is filtered plan-side and the
    scan is constructed from the surviving paths — so the pruning
    happens before any data file is opened, exactly the
    manifest-pruning contract of an Iceberg/Delta planner. The
    file-count proof (selected files only; see
    tests/test_warehouse_maintenance.py) is asserted via inputFiles.
    Integer cents keep the aggregate engine-exact."""
    import os

    root = _manifest_staging(spark, sf_dir)
    # the manifest: partition value -> directory (derived by listing;
    # a lakehouse reads this from its metadata layer)
    manifest = [
        (d.split("=", 1)[1], os.path.join(root, d))
        for d in sorted(os.listdir(root))
        if d.startswith("part_key=")
    ]
    selected = [
        path
        for part_key, path in manifest
        if _MANIFEST_LO <= part_key <= _MANIFEST_HI
    ]
    if not selected:
        raise ValueError(
            f"manifest band [{_MANIFEST_LO}, {_MANIFEST_HI}] matched no "
            f"partitions of {root} ({len(manifest)} listed) — the source "
            "lineitem has no shipdates in the band"
        )
    pruned = spark.read.option("basePath", root).parquet(*selected)
    return (
        pruned.groupBy("part_key")
        .agg(
            F.sum("price_cents").alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(F.col("part_key").cast("string"), "revenue_cents", "n_rows")
        .orderBy("part_key")
    )


MANIFEST_PRUNING_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS part_key,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       COUNT(*) AS n_rows
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m') BETWEEN '{_MANIFEST_LO}' AND '{_MANIFEST_HI}'
GROUP BY 1
ORDER BY 1
"""

QUERIES["manifest_partition_pruning"] = manifest_partition_pruning
ORACLES["manifest_partition_pruning"] = MANIFEST_PRUNING_SQL
