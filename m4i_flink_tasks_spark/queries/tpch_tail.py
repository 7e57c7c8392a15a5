"""The remaining classic TPC-H plan shapes (Q11/Q12/Q16/Q20), adapted
to the testdata's columns (no partsupp/shipmode/availqty — lineitem's
(l_partkey, l_suppkey) pairs play the part-supplier relation and
``l_returnflag`` the ship-mode class; predicates differ, plan shapes
are faithful). With these, all 22 TPC-H shapes have an engine form.

The reference has no query language at all (SURVEY §2.6) — like
`subqueries.py`, this widens the generic relational surface beyond the
reference's operator list.

Scale notes (100 TB posture):
- Q11's scalar-subquery threshold is computed FROM the per-part aggregate
  (a window over the already-reduced rows), never by rescanning
  lineitem; the empty-frame window funnels only ~|part| pre-reduced
  rows through one task — swap for a broadcast 1-row cross join if the
  part dimension itself outgrows a task.
- Q12 filters lineitem by ship date BEFORE the big-big orderkey join,
  so the shuffle carries one year, not seven.
- Q16 reduces lineitem to DISTINCT (part, supplier) pairs map-side
  before any join, anti-joins the (tiny, broadcast) complaint
  suppliers, and broadcast-joins the filtered part dim.
- Q20's nested semi-join chain stays semi end-to-end: only join keys
  cross shuffles, and the correlated "half this part's annual volume"
  threshold decorrelates to one aggregate + a same-key join.

All compared quantities are sums of integer-valued ``l_quantity`` (and
plain counts), so every HAVING/threshold comparison is exact FP
arithmetic — deterministic across Spark's and DuckDB's addition orders
(unlike price sums, whose last-ulp rounding is order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-sum with a HAVING over a scalar subquery
    of the same aggregate.

    Parts whose shipped quantity from NATION_3's suppliers exceeds
    twice the average per-part quantity shipped by those suppliers.
    (TPC-H uses ``sum * fraction`` with a fraction that must shrink
    1/SF; an average multiple keeps the identical scalar-subquery
    HAVING shape while staying selective-but-nonempty at every SF.)
    The threshold is a window aggregate over the per-part rows
    (already reduced to |part| rows), so lineitem is scanned once.
    """
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("l_quantity").cast("bigint").alias("value_qty"))
    )
    mean = F.avg("value_qty").over(Window.partitionBy())
    return (
        value.withColumn("_mean", mean)
        .filter(F.col("value_qty") > 2.0 * F.col("_mean"))
        .select("partkey", "value_qty")
        .orderBy(F.desc("value_qty"), "partkey")
    )


Q11_SQL = """
WITH natsupp AS (
    SELECT s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
), val AS (
    SELECT l_partkey AS partkey,
           CAST(sum(l_quantity) AS BIGINT) AS value_qty
    FROM lineitem JOIN natsupp ON l_suppkey = s_suppkey
    GROUP BY 1
)
SELECT partkey, value_qty
FROM val
WHERE value_qty > (SELECT 2.0 * avg(value_qty) FROM val)
ORDER BY value_qty DESC, partkey
"""


def q12_shipclass_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: big-big join + conditional aggregation.

    Per return-flag class of 1996 shipments, how many lines belong to
    high-priority orders vs the rest. The ship-date filter lands on
    the lineitem scan (pushed), so the orderkey shuffle carries one
    year of lines; orders contributes only (key, priority).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


Q12_SQL = """
SELECT l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-pair relation, NOT-IN exclusion,
    COUNT(DISTINCT) per attribute bucket.

    How many distinct suppliers (excluding complaint suppliers — the
    negative-balance proxy) ship parts of selected sizes, per
    (brand, type, size). The pair relation is lineitem reduced to
    DISTINCT (l_partkey, l_suppkey) map-side; the exclusion list is a
    broadcast anti join (NOT IN with non-null keys ≡ anti).
    """
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    complaints = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        pairs.join(
            F.broadcast(complaints),
            pairs.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join chain with a decorrelated
    per-part threshold.

    EUROPE suppliers who shipped, during 1996, more than 70% of some
    'small %'-named part's total 1996 volume. The correlated "share of
    this part's annual volume" decorrelates to one (part, supplier)
    aggregate plus a per-part total derived from it — then the chain
    stays semi-joins (keys only) back up to the supplier dimension.
    (Region, not single-nation, filter: the sf0.001 smoke data has one
    supplier per nation, so Q20's nation predicate would be vacuous.)
    """
    target = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(target), li.l_partkey == target.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    )
    part_total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    dominant = (
        shipped.withColumn("_total", part_total)
        .filter(F.col("qty") > 0.7 * F.col("_total"))
        .select("l_suppkey")
        .distinct()
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH target AS (
    SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
), shipped AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(l_quantity) AS BIGINT) AS qty
    FROM lineitem JOIN target ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
), dominant AS (
    SELECT DISTINCT l_suppkey
    FROM shipped
    WHERE qty > 0.7 * (SELECT sum(qty) FROM shipped s2
                       WHERE s2.l_partkey = shipped.l_partkey)
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_suppkey
"""


QUERIES = {
    "q11_important_parts": q11_important_parts,
    "q12_shipclass_priority": q12_shipclass_priority,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_promotion_suppliers": q20_promotion_suppliers,
}

ORACLES = {
    "q11_important_parts": Q11_SQL,
    "q12_shipclass_priority": Q12_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_promotion_suppliers": Q20_SQL,
}
