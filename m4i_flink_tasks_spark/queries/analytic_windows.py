"""Analytic window frames the rest of the inventory doesn't exercise:
time-interval RANGE frames and rank-distribution functions.

The windowing already proven elsewhere is ROWS-framed (rolling z-score,
moving averages) or partition-wide (deciles, SCD2 lag/lead). This module
pins the remaining frame semantics:

- RANGE frames over event time ("trailing 30 days") — the frame is
  defined by VALUE distance, so date-peers share one frame regardless
  of row order; Spark expresses it as ``rangeBetween`` over epoch
  seconds, DuckDB natively as ``RANGE BETWEEN INTERVAL``. Same keyed
  shuffle as any window — one exchange per partitioning.
- percent_rank / cume_dist — rank-based distributions whose results
  are exact integers-over-integers, so cross-engine parity is exact.

Scale notes (100 TB posture): both queries shuffle once on their
partition key; the RANGE frame is evaluated with a sliding two-pointer
over the sorted partition (no per-row rescan), and the distribution
query's partition is dimension-sized (nations) after a broadcast-joined
pre-aggregation of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table

_TRAILING_DAYS = 30


def rolling_30d_customer_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per order: the customer's trailing-30-day order revenue and count.

    RANGE frame over o_orderdate (epoch seconds): every order sees the
    sum of the SAME customer's orders dated within the preceding 30
    days inclusive — orders sharing a date are peers and see identical
    frames, which a ROWS frame would get wrong.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
    )
    ts = F.unix_timestamp("o_orderdate")
    win = (
        Window.partitionBy("o_custkey")
        .orderBy(ts)
        .rangeBetween(-_TRAILING_DAYS * 86400, 0)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.sum("o_totalprice").over(win), 2).alias(
                "trailing_30d_revenue"
            ),
            F.count(F.lit(1)).over(win).alias("trailing_30d_orders"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


ROLLING_30D_SQL = f"""
SELECT o_orderkey,
       o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(o_totalprice) OVER w, 2) AS trailing_30d_revenue,
       count(*) OVER w                    AS trailing_30d_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL {_TRAILING_DAYS} DAYS PRECEDING
                       AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def nation_revenue_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rank-distribution profile of per-nation revenue.

    Fact side pre-aggregates per customer nation (broadcast dim join),
    then percent_rank / cume_dist / running revenue share over the
    25-row nation relation. The distribution functions are
    ratios of ranks — exact across engines; only the running share is
    a rounded double.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_nation = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .groupBy("c_nationkey")
        .agg(F.sum("o_totalprice").alias("revenue"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == nation.n_nationkey,
        )
    )
    # Rank by the ROUNDED revenue (repo rule: round before ranking —
    # Spark and DuckDB summation order can differ in the last ulp, and
    # near-tied nations must order identically in both engines).
    per_nation = per_nation.withColumn("revenue", F.round("revenue", 2))
    win = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
    total = Window.partitionBy()
    return per_nation.select(
        "n_name",
        "revenue",
        F.round(F.percent_rank().over(win), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(win), 6).alias("cume_dist"),
        F.round(
            F.sum("revenue").over(
                win.rowsBetween(Window.unboundedPreceding, 0)
            )
            / F.sum("revenue").over(total),
            6,
        ).alias("running_share"),
    ).orderBy(F.desc("revenue"), F.asc("n_name"))


NATION_DISTRIBUTION_SQL = """
WITH per_nation AS (
    SELECT c_nationkey, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
)
SELECT n_name,
       revenue,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()   OVER w, 6) AS cume_dist,
       round(sum(revenue) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)
             / sum(revenue) OVER (), 6) AS running_share
FROM per_nation
JOIN nation ON n_nationkey = c_nationkey
WINDOW w AS (ORDER BY revenue DESC, n_name)
ORDER BY revenue DESC, n_name
"""


QUERIES = {
    "rolling_30d_customer_revenue": rolling_30d_customer_revenue,
    "nation_revenue_distribution": nation_revenue_distribution,
}

ORACLES = {
    "rolling_30d_customer_revenue": ROLLING_30D_SQL,
    "nation_revenue_distribution": NATION_DISTRIBUTION_SQL,
}
