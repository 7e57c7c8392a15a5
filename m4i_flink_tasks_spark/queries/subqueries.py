"""Subquery-shaped relational queries (EXISTS / NOT EXISTS / correlated
scalar / outer-join distribution) over the TPC-H-ish testdata.

The reference has no query language at all (SURVEY §2.6) — these extend
the generic-operator coverage with the classic decorrelation shapes a
warehouse engine must get right: Catalyst rewrites EXISTS to LeftSemi,
NOT EXISTS to LeftAnti, and a correlated scalar aggregate to an
aggregate-then-join — all shuffle-side decisions AQE can re-plan at
scale. Shapes follow TPC-H Q4/Q13/Q17/Q21/Q22, adapted to the columns
the testdata actually has (no partsupp/shipmode/commitdate, so the
predicates differ while the plan shapes are faithful).

Scale notes (100 TB posture):
- semi/anti joins never materialize the probe side's payload columns —
  only the join key crosses the shuffle for the subquery side;
- the correlated-scalar rewrite (q17) computes the per-group aggregate
  once and broadcast-joins it back instead of re-scanning per row;
- q21's "no OTHER supplier returned" anti join carries a compound
  non-equi condition — Catalyst keeps it a single LeftAnti over the
  order-keyed shuffle rather than a cartesian check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table


def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join then count per priority.

    Orders in one quarter that have at least one returned lineitem
    (the testdata has no commitdate/receiptdate, so ``l_returnflag =
    'R'`` plays the "late line" predicate). The lineitem side reaches
    the join as key-only rows; Spark plans a LeftSemi over l_orderkey.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority,
       count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause filter, two-level agg.

    Distribution of order counts per customer, where the filter
    (priority <> 1-URGENT) must live in the JOIN condition — pushing it
    to a WHERE would silently drop the zero-order customers the outer
    join exists to keep. ``count(o_orderkey)`` counts non-null matches
    only, so empty customers land in the c_count=0 bucket.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_customer = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count,
       count(*) AS custdist
FROM (SELECT c_custkey,
             count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate, decorrelated.

    Revenue lost to small orders: lineitems of two brands whose
    quantity is under 20% of that part's average quantity. The naive
    correlated form re-aggregates lineitem per probe row; the engine's
    plan computes the per-part average ONCE over the brand-filtered
    subset and broadcast-joins the thresholds back — the filtered part
    dimension is broadcast so lineitem is scanned exactly twice with
    the brand semi-filter pushed both times, and never shuffled.
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#4", "Brand#2")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresholds = branded.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        branded.join(
            F.broadcast(thresholds),
            branded.l_partkey == thresholds.t_partkey,
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*)                             AS n_small_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand IN ('Brand#4', 'Brand#2')
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q21_sole_returner_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS with non-equi conditions.

    Suppliers who were the ONLY supplier to have a returned line on a
    shared (multi-supplier) order: for each returned line, there EXISTS
    another supplier's line on the same order, and there does NOT EXIST
    another supplier's RETURNED line on it. Both subqueries carry the
    ``l2.l_suppkey <> l1.l_suppkey`` non-equi term, so Catalyst plans
    one LeftSemi and one LeftAnti over the same order-keyed shuffle —
    no cartesian fallback (pinned in tests/test_plan_shape.py).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")
    supplier = load_table(spark, sf_dir, "supplier")
    shared = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = shared.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name,
       count(*) AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar subquery + NOT EXISTS anti join.

    Wealthy-but-idle customers: balance above the average positive
    balance, and no orders since 1999 (every testdata customer has SOME
    order, so the recency predicate keeps the proof non-vacuous — same
    device as ``customers_without_orders``). The global average is a
    one-row aggregate broadcast into the filter (crossJoin of a 1-row
    frame — Spark's decorrelation of an uncorrelated scalar subquery);
    the "no recent orders" test is a LeftAnti against the key-only
    filtered orders projection, grouped by nation.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey,
       count(*)                 AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional-sum ratio inside a star join.

    Per order year, the revenue share delivered by suppliers of one
    nation to customers in one region. Five dimension joins — all
    broadcast (region-filtered customer nations; the full 25-row
    supplier nation map); the only fact shuffle is the final year
    aggregate. The share is a conditional sum over the SAME aggregate
    pass (sum(if)/sum), not a self-join of two aggregations.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(
        F.col("supp_nation") == "NATION_7", vol
    ).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_7'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2)   AS total_volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY year(o_orderdate)
ORDER BY o_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar-max equality.

    Quarterly revenue per supplier, then the supplier(s) matching the
    maximum — the "view + scalar subquery on the view" pattern. The
    revenue relation is aggregated ONCE and reused for both the max
    (one-row broadcast) and the equality probe. Revenue is rounded
    BEFORE the max comparison in both engines so a cross-engine
    summation-order ulp cannot flip the winner.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(supplier),
            F.col("supplier_no") == supplier.s_suppkey,
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


QUERIES = {
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q4_priority_exists": q4_priority_exists,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q21_sole_returner_suppliers": q21_sole_returner_suppliers,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q8_market_share": Q8_SQL,
    "q15_top_supplier": Q15_SQL,
    "q4_priority_exists": Q4_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q21_sole_returner_suppliers": Q21_SQL,
    "q22_idle_customers": Q22_SQL,
}
