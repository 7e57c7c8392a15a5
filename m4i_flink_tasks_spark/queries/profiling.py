"""Data profiling and constraint validation (deequ/dbt-test-style).

The operational counterpart of the analytics queries: before a 100 TB
corpus is trusted, a pipeline profiles it (per-column null rates,
cardinalities, extremes, dominant values) and asserts its contracts
(key uniqueness, referential integrity, value ranges). The reference
has no analogue — its only validation is the per-record structure
check (P4); these are driver-added capabilities, expression-native and
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One profile row per column of ``documents``: null count, exact
    distinct count, min/max (as strings, so one schema fits every
    column), and the dominant value with its frequency.

    Plan: the unpivot (``stack``) turns the scan into (column, value)
    pairs — one pass over the table regardless of column count — and
    both aggregates (per-column stats, per-(column,value) counts for
    the mode) group on keys with column-count-bounded cardinality.
    The mode's tie is broken by value so the profile is deterministic.
    At scale the exact distinct count is the expensive aggregate;
    the KMV sketch (queries/sketches.py) is the drop-in when an
    estimate suffices."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        F.expr(
            "stack({n}, {args}) as (col_name, value)".format(
                n=len(_PROFILE_COLS),
                args=", ".join(
                    f"'{c}', cast({c} as string)" for c in _PROFILE_COLS
                ),
            )
        )
    )
    stats = pairs.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
            "n_nulls"
        ),
        F.countDistinct("value").alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    by_count = Window.partitionBy("col_name").orderBy(
        F.col("cnt").desc(), F.col("value")
    )
    mode = (
        pairs.filter(F.col("value").isNotNull())
        .groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(by_count))
        .filter(F.col("rn") == 1)
        .select(
            "col_name",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return (
        stats.join(mode, "col_name")
        .orderBy("col_name")
    )


TABLE_PROFILE_SQL = f"""
WITH pairs AS (
    {" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, {c}::VARCHAR AS value FROM documents"
        for c in _PROFILE_COLS
    )}
), stats AS (
    SELECT col_name,
           count(*) AS n_rows,
           count(*) FILTER (value IS NULL) AS n_nulls,
           count(DISTINCT value) AS n_distinct,
           min(value) AS min_value,
           max(value) AS max_value
    FROM pairs
    GROUP BY col_name
), mode AS (
    SELECT col_name, value AS top_value, cnt AS top_count
    FROM (
        SELECT col_name, value, count(*) AS cnt,
               row_number() OVER (PARTITION BY col_name
                                  ORDER BY count(*) DESC, value) AS rn
        FROM pairs
        WHERE value IS NOT NULL
        GROUP BY col_name, value
    )
    WHERE rn = 1
)
SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
       top_value, top_count
FROM stats JOIN mode USING (col_name)
ORDER BY col_name
"""


def integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract assertions over the relational tables, one row per
    check with its violation count — the dbt-test / deequ shape. Each
    check is a single aggregate or anti-join (orphan FKs surface as
    left-anti rows, never a row-explosion), unioned into one result so
    a scheduler gates on ``max(n_violations) == 0``."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    dup_orders = check(
        "orders_pk_unique",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1),
    )
    orphan_orders = check(
        "orders_custkey_fk",
        orders.join(
            customer,
            orders.o_custkey == customer.c_custkey,
            "left_anti",
        ),
    )
    orphan_lineitem = check(
        "lineitem_orderkey_fk",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti"
        ),
    )
    bad_price = check(
        "orders_totalprice_positive",
        orders.filter(F.col("o_totalprice") <= 0),
    )
    bad_qty = check(
        "lineitem_quantity_range",
        lineitem.filter(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ),
    )
    bad_dates = check(
        "lineitem_ship_after_order",
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).filter(F.col("l_shipdate") < F.col("o_orderdate")),
    )
    out = dup_orders
    for c in (orphan_orders, orphan_lineitem, bad_price, bad_qty, bad_dates):
        out = out.unionByName(c)
    return out.orderBy("check_name")


INTEGRITY_CHECKS_SQL = """
SELECT 'orders_pk_unique' AS check_name,
       count(*) AS n_violations
FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
UNION ALL
SELECT 'orders_custkey_fk',
       count(*)
FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       count(*)
FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_totalprice_positive',
       count(*)
FROM orders WHERE o_totalprice <= 0
UNION ALL
SELECT 'lineitem_quantity_range',
       count(*)
FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
UNION ALL
SELECT 'lineitem_ship_after_order',
       count(*)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
ORDER BY check_name
"""


def zorder_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values for the part table's (p_partkey, p_size) — the
    clustering key a multi-dimension-filtered layout would sort by
    (operators/zorder.py; skipping effect pinned by
    tests/test_zorder_skipping.py against parquet footer stats). Pure
    shift/mask integer arithmetic, identical in DuckDB.

    Asymmetric bit budget: p_size is bounded (≤ 50 → 6 bits) but
    p_partkey reaches 2·10^5·SF, so an equal 10-bit budget would alias
    distinct parts into the same z cell at every non-toy SF and the
    clustering would degrade toward hash order. 6 interleaved bits +
    26 high p_partkey bits keeps the mapping injective through
    SF ≈ 335."""
    from ..operators.zorder import z_value

    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            "p_size",
            z_value("p_partkey", "p_size", 6, x_bits=26).alias("z"),
        )
        .orderBy("z", "p_partkey")
        .limit(500)
    )


def _zorder_sql() -> str:
    from ..operators.zorder import z_sql_duckdb

    return f"""
SELECT p_partkey, p_size,
       {z_sql_duckdb("p_partkey", "p_size", 6, 26)} AS z
FROM part
ORDER BY z, p_partkey
LIMIT 500
"""


QUERIES = {
    "table_profile": table_profile,
    "integrity_checks": integrity_checks,
    "zorder_mapping": zorder_mapping,
}

ORACLES = {
    "table_profile": TABLE_PROFILE_SQL,
    "integrity_checks": INTEGRITY_CHECKS_SQL,
    "zorder_mapping": _zorder_sql(),
}


def join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the report read before choosing a
    join strategy (broadcast / salt / AQE skew-split): per candidate
    key, the cardinality, the heaviest key's share, the top-10 keys'
    share, and how many keys run hotter than 2x/4x the mean. All
    ratios are rationals of exact counts, so the report is
    engine-exact.

    Scale shape: one map-side-combinable count per key column plus
    dimension-sized top-k extractions — the same pass a skew-aware
    planner (AQE) makes, surfaced as data."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def stats(df: DataFrame, col: str, name: str) -> DataFrame:
        counts = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        top10 = counts.orderBy(F.desc("c"), "k").limit(10)
        agg = counts.agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_count"),
        )
        t10 = top10.agg(F.sum("c").alias("top10_count"))
        hot = counts.join(F.broadcast(agg.select("n_rows", "n_keys")), how="cross")
        hot_agg = hot.agg(
            F.sum(
                F.when(
                    F.col("c") * F.col("n_keys") > 2 * F.col("n_rows"), 1
                ).otherwise(0)
            ).alias("n_keys_gt_2x"),
            F.sum(
                F.when(
                    F.col("c") * F.col("n_keys") > 4 * F.col("n_rows"), 1
                ).otherwise(0)
            ).alias("n_keys_gt_4x"),
        )
        return (
            agg.join(t10, how="cross")
            .join(F.broadcast(hot_agg), how="cross")
            .select(
                F.lit(name).alias("join_key"),
                "n_rows",
                "n_keys",
                "max_count",
                F.round(F.col("max_count") / F.col("n_rows"), 6).alias(
                    "max_share"
                ),
                F.round(F.col("top10_count") / F.col("n_rows"), 6).alias(
                    "top10_share"
                ),
                F.col("n_keys_gt_2x").cast("long").alias("n_keys_gt_2x"),
                F.col("n_keys_gt_4x").cast("long").alias("n_keys_gt_4x"),
            )
        )

    return (
        stats(lineitem, "l_suppkey", "lineitem.l_suppkey")
        .unionByName(stats(lineitem, "l_partkey", "lineitem.l_partkey"))
        .unionByName(stats(orders, "o_custkey", "orders.o_custkey"))
        .orderBy("join_key")
    )


def _skew_stats_sql(table: str, col: str, name: str) -> str:
    return f"""
SELECT '{name}' AS join_key,
       (SELECT count(*) FROM {table}) AS n_rows,
       (SELECT count(DISTINCT {col}) FROM {table}) AS n_keys,
       (SELECT max(c) FROM (SELECT count(*) AS c FROM {table} GROUP BY {col})) AS max_count,
       round((SELECT max(c) FROM (SELECT count(*) AS c FROM {table} GROUP BY {col}))::DOUBLE
             / (SELECT count(*) FROM {table}), 6) AS max_share,
       round((SELECT sum(c) FROM (SELECT count(*) AS c FROM {table}
                                  GROUP BY {col} ORDER BY c DESC LIMIT 10))::DOUBLE
             / (SELECT count(*) FROM {table}), 6) AS top10_share,
       (SELECT count(*) FROM (SELECT count(*) AS c FROM {table} GROUP BY {col})
        WHERE c * (SELECT count(DISTINCT {col}) FROM {table})
              > 2 * (SELECT count(*) FROM {table})) AS n_keys_gt_2x,
       (SELECT count(*) FROM (SELECT count(*) AS c FROM {table} GROUP BY {col})
        WHERE c * (SELECT count(DISTINCT {col}) FROM {table})
              > 4 * (SELECT count(*) FROM {table})) AS n_keys_gt_4x
"""


JOIN_SKEW_SQL = (
    _skew_stats_sql("lineitem", "l_suppkey", "lineitem.l_suppkey")
    + " UNION ALL "
    + _skew_stats_sql("lineitem", "l_partkey", "lineitem.l_partkey")
    + " UNION ALL "
    + _skew_stats_sql("orders", "o_custkey", "orders.o_custkey")
    + " ORDER BY join_key"
)

QUERIES["join_skew_report"] = join_skew_report
ORACLES["join_skew_report"] = JOIN_SKEW_SQL


_KANON_K = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-anonymity audit over quasi-identifiers — the privacy gate a
    dataset release runs before publication.

    Quasi-identifier class = (nation, market segment, account-balance
    thousand-bucket); the bucket is integer arithmetic on rounded cents
    so the class boundary is engine-exact. The report aggregates class
    SIZES into anonymity bands (unique / 2..k-1 / k..2k-1 / >=2k) with
    the row counts at risk — bounded output at any scale, unlike a
    violating-class listing.

    Scale posture: two map-side-combinable aggregates (rows -> classes
    -> bands); nothing joins, nothing sorts more than 4 rows. Suppress
    / generalize decisions consume this report; the class relation
    itself stays distributed.
    """
    customer = load_table(spark, sf_dir, "customer")
    classes = (
        customer.select(
            "c_nationkey",
            "c_mktsegment",
            (
                F.round(F.col("c_acctbal") * 100).cast("long")
                / F.lit(100_000)
            )
            .cast("long")
            .alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    band = (
        F.when(F.col("class_size") == 1, "1 unique")
        .when(F.col("class_size") < _KANON_K, f"2 under-k (<{_KANON_K})")
        .when(
            F.col("class_size") < 2 * _KANON_K,
            f"3 k-anonymous (<{2 * _KANON_K})",
        )
        .otherwise(f"4 comfortable (>={2 * _KANON_K})")
    )
    return (
        classes.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("class_size").alias("min_class"),
            F.max("class_size").alias("max_class"),
        )
        .orderBy("band")
    )


K_ANONYMITY_SQL = f"""
WITH classes AS (
    SELECT c_nationkey, c_mktsegment,
           round(c_acctbal * 100)::BIGINT // 100000 AS bal_bucket,
           count(*) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
)
SELECT CASE
         WHEN class_size = 1 THEN '1 unique'
         WHEN class_size < {_KANON_K} THEN '2 under-k (<{_KANON_K})'
         WHEN class_size < {2 * _KANON_K} THEN '3 k-anonymous (<{2 * _KANON_K})'
         ELSE '4 comfortable (>={2 * _KANON_K})'
       END AS band,
       count(*) AS n_classes,
       sum(class_size)::BIGINT AS n_rows,
       min(class_size) AS min_class,
       max(class_size) AS max_class
FROM classes
GROUP BY band
ORDER BY band
"""

QUERIES["k_anonymity_audit"] = k_anonymity_audit
ORACLES["k_anonymity_audit"] = K_ANONYMITY_SQL


_LDIV_L = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al., "l-Diversity:
    Privacy Beyond k-Anonymity", TKDD 2007) — the companion gate to
    k_anonymity_audit: a class can be large (k-anonymous) yet still
    leak if every member shares the SENSITIVE value, so the release
    gate also requires >= l distinct sensitive values per class.

    Quasi-identifier class = (nation, account-balance thousand-bucket),
    sensitive attribute = market segment. Report = classes and rows per
    diversity band (homogeneous / under-l / l-diverse) — bounded output
    at any scale, same two map-side-combinable aggregates as the
    k-anonymity report (the distinct count rides the same shuffle as
    the class group-by)."""
    customer = load_table(spark, sf_dir, "customer")
    classes = (
        customer.select(
            "c_nationkey",
            (
                F.round(F.col("c_acctbal") * 100).cast("long")
                / F.lit(100_000)
            )
            .cast("long")
            .alias("bal_bucket"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("c_mktsegment").alias("l_distinct"),
        )
    )
    band = (
        F.when(F.col("l_distinct") == 1, "1 homogeneous")
        .when(F.col("l_distinct") < _LDIV_L, f"2 under-l (<{_LDIV_L})")
        .otherwise(f"3 l-diverse (>={_LDIV_L})")
    )
    return (
        classes.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
            F.min("l_distinct").alias("min_l"),
            F.max("l_distinct").alias("max_l"),
        )
        .orderBy("band")
    )


L_DIVERSITY_SQL = f"""
WITH classes AS (
    SELECT c_nationkey,
           round(c_acctbal * 100)::BIGINT // 100000 AS bal_bucket,
           count(*) AS class_size,
           count(DISTINCT c_mktsegment) AS l_distinct
    FROM customer
    GROUP BY 1, 2
)
SELECT CASE
         WHEN l_distinct = 1 THEN '1 homogeneous'
         WHEN l_distinct < {_LDIV_L} THEN '2 under-l (<{_LDIV_L})'
         ELSE '3 l-diverse (>={_LDIV_L})'
       END AS band,
       count(*) AS n_classes,
       sum(class_size)::BIGINT AS n_rows,
       min(l_distinct) AS min_l,
       max(l_distinct) AS max_l
FROM classes
GROUP BY band
ORDER BY band
"""

QUERIES["l_diversity_audit"] = l_diversity_audit
ORACLES["l_diversity_audit"] = L_DIVERSITY_SQL


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, "t-Closeness:
    Privacy Beyond k-Anonymity and l-Diversity", ICDE 2007) — the third
    gate of the privacy triad: a class can be k-anonymous AND l-diverse
    yet still leak if its sensitive-value DISTRIBUTION is skewed vs the
    table's. For the categorical sensitive attribute the distance is
    total variation (equal-ground EMD): tvd = ½·Σ_v |p_class(v) −
    p_global(v)|.

    Same conventions as its siblings: QI class = (nation,
    balance-thousand-bucket), sensitive = market segment. ALL
    comparisons are exact integers: with class size cs, table size N,
    per-(class,v) count cnt_v and global count g_v,
    num = Σ_{v in class}(|cnt_v·N − g_v·cs| − g_v·cs) + N·cs equals
    Σ_{all v} |cnt_v·N − g_v·cs| without materializing absent values
    (Σ_all g_v = N), tvd = num / (2·cs·N) as ONE final division, and
    the t = 0.1 / 0.2 band thresholds compare 10·num / 5·num against
    2·cs·N — integer-exact, so no float-summation-order drift can flip
    a band. Scale shape: two map-side-combinable aggregates (cells,
    then classes) + one broadcast of the |segments|-row global
    distribution; output is band-bounded at any scale."""
    customer = load_table(spark, sf_dir, "customer")
    base = customer.select(
        "c_nationkey",
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            / F.lit(100_000)
        )
        .cast("long")
        .alias("bal_bucket"),
        "c_mktsegment",
    )
    cells = base.groupBy(
        "c_nationkey", "bal_bucket", "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return t_closeness_from_cells(cells)


def t_closeness_from_cells(cells: DataFrame) -> DataFrame:
    """The banding readout over any (c_nationkey, bal_bucket,
    c_mktsegment) -> cnt cell relation — shared by the batch audit
    above and the streaming maintained-cells twin
    (``stream_t_closeness``), whose additive keyed state equals the
    batch cells for any batch split. The global distribution and table
    total re-derive FROM the cells (sum over classes), so the audit is
    self-contained on its state."""
    glob = cells.groupBy("c_mktsegment").agg(F.sum("cnt").alias("g"))
    total = cells.agg(F.sum("cnt").alias("n_total"))
    wc = Window.partitionBy("c_nationkey", "bal_bucket")
    cells = (
        cells.withColumn("cs", F.sum("cnt").over(wc))
        .join(F.broadcast(glob), "c_mktsegment")
        .crossJoin(F.broadcast(total))
    )
    classes = cells.groupBy("c_nationkey", "bal_bucket").agg(
        F.max("cs").alias("cs"),
        F.max("n_total").alias("n_total"),
        F.sum(
            F.abs(F.col("cnt") * F.col("n_total") - F.col("g") * F.col("cs"))
            - F.col("g") * F.col("cs")
        ).alias("num_partial"),
    )
    num = F.col("num_partial") + F.col("n_total") * F.col("cs")
    den = F.lit(2) * F.col("cs") * F.col("n_total")
    scored = classes.select(
        "cs",
        (num / den.cast("double")).alias("tvd"),
        F.when(F.lit(10) * num <= den, "1 t-close (<=0.1)")
        .when(F.lit(5) * num <= den, "2 near (<=0.2)")
        .otherwise("3 violating (>0.2)")
        .alias("band"),
    )
    return (
        scored.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("cs").alias("n_rows"),
            F.round(F.min("tvd"), 6).alias("min_tvd"),
            F.round(F.max("tvd"), 6).alias("max_tvd"),
        )
        .orderBy("band")
    )


T_CLOSENESS_SQL = """
WITH base AS (
    SELECT c_nationkey,
           round(c_acctbal * 100)::BIGINT // 100000 AS bal_bucket,
           c_mktsegment
    FROM customer
), gdist AS (
    SELECT c_mktsegment, count(*) AS g FROM base GROUP BY 1
), total AS (SELECT count(*) AS n_total FROM base),
cells AS (
    SELECT c_nationkey, bal_bucket, c_mktsegment, count(*) AS cnt
    FROM base GROUP BY 1, 2, 3
), withcs AS (
    SELECT c.*, sum(cnt) OVER (PARTITION BY c_nationkey, bal_bucket) AS cs,
           g.g, t.n_total
    FROM cells c JOIN gdist g USING (c_mktsegment) CROSS JOIN total t
), classes AS (
    SELECT c_nationkey, bal_bucket, max(cs) AS cs, max(n_total) AS n_total,
           sum(abs(cnt * n_total - g * cs) - g * cs) AS num_partial
    FROM withcs GROUP BY 1, 2
), scored AS (
    SELECT cs,
           (num_partial + n_total * cs)
               / (2.0 * cs * n_total) AS tvd,
           CASE WHEN 10 * (num_partial + n_total * cs)
                     <= 2 * cs * n_total THEN '1 t-close (<=0.1)'
                WHEN 5 * (num_partial + n_total * cs)
                     <= 2 * cs * n_total THEN '2 near (<=0.2)'
                ELSE '3 violating (>0.2)' END AS band
    FROM classes
)
SELECT band,
       count(*) AS n_classes,
       sum(cs)::BIGINT AS n_rows,
       round(min(tvd), 6) AS min_tvd,
       round(max(tvd), 6) AS max_tvd
FROM scored
GROUP BY band
ORDER BY band
"""

QUERIES["t_closeness_audit"] = t_closeness_audit
ORACLES["t_closeness_audit"] = T_CLOSENESS_SQL


def numeric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation across lineitem's numeric columns —
    the feature-selection read a modeling pipeline takes before
    training on warehouse columns. ONE pass computes every moment
    (sums, squares, cross-products) as EXACT decimal arithmetic over
    integer-scaled values (quantity units, price cents, discount/tax
    basis points), so the only float math is the final six-decimal
    ratio on exact inputs — engine-exact by construction and immune to
    summation-order noise. Scale shape: a single map-side-combinable
    aggregate (no shuffle beyond the 1-row combine), then a constant
    6-row explode; the same plan at 100 TB reads each column once."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": F.col("l_quantity").cast("long"),
        "price_cents": F.round(F.col("l_extendedprice") * 100).cast("long"),
        "discount_bp": F.round(F.col("l_discount") * 10000).cast("long"),
        "tax_bp": F.round(F.col("l_tax") * 10000).cast("long"),
    }
    proj = li.select(
        *[v.cast(_MOMENT_DEC).alias(k) for k, v in cols.items()]
    )
    return corr_from_moments(proj.agg(*moment_aggs()))


_CORR_NAMES = ("quantity", "price_cents", "discount_bp", "tax_bp")
_MOMENT_DEC = "decimal(38,0)"


def moment_aggs() -> list:
    """The exact moment-vector aggregate (count, sums, squares,
    cross-products over _CORR_NAMES, all in exact decimal) — ONE
    definition shared by the batch query above and the streaming state
    twin's per-batch fold, so the stream==batch monoid argument cannot
    drift."""
    names = list(_CORR_NAMES)
    aggs = [F.count(F.lit(1)).cast(_MOMENT_DEC).alias("n")]
    for a in names:
        aggs.append(F.sum(F.col(a)).alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).alias(f"ss_{a}"))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    return aggs


def corr_from_moments(moments: DataFrame) -> DataFrame:
    """The Pearson readout over the exact moment vector — shared by
    the batch query above and the streaming additive-moment state twin
    (streaming/moments_state.py), whose maintained vector is
    batch-equal by the addition monoid."""
    names = list(_CORR_NAMES)
    pair_structs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(
                f"s_{b}"
            )
            var_a = F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(
                f"s_{a}"
            )
            var_b = F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(
                f"s_{b}"
            )
            corr = F.round(
                num.cast("double")
                / F.sqrt(var_a.cast("double") * var_b.cast("double")),
                6,
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    corr.alias("pearson_r"),
                )
            )
    return (
        moments.select(
            F.col("n").cast("long").alias("n_rows"),
            F.explode(F.array(*pair_structs)).alias("p"),
        )
        .select("p.col_x", "p.col_y", "p.pearson_r", "n_rows")
        .orderBy("col_x", "col_y")
    )


def _corr_sql() -> str:
    names = ["quantity", "price_cents", "discount_bp", "tax_bp"]
    exprs = {
        "quantity": "CAST(l_quantity AS HUGEINT)",
        "price_cents": "CAST(round(l_extendedprice * 100) AS HUGEINT)",
        "discount_bp": "CAST(round(l_discount * 10000) AS HUGEINT)",
        "tax_bp": "CAST(round(l_tax * 10000) AS HUGEINT)",
    }
    moment_cols = ["COUNT(*)::HUGEINT AS n"]
    for a in names:
        moment_cols.append(f"SUM({exprs[a]}) AS s_{a}")
        moment_cols.append(f"SUM({exprs[a]} * {exprs[a]}) AS ss_{a}")
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            moment_cols.append(f"SUM({exprs[a]} * {exprs[b]}) AS sp_{a}_{b}")
            pairs.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
                f"ROUND(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE) / "
                f"SQRT(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE) * "
                f"CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 6) "
                f"AS pearson_r, CAST(n AS BIGINT) AS n_rows FROM moments"
            )
    return (
        "WITH moments AS (SELECT "
        + ", ".join(moment_cols)
        + " FROM lineitem) "
        + " UNION ALL ".join(pairs)
        + " ORDER BY col_x, col_y"
    )


QUERIES["numeric_correlation_matrix"] = numeric_correlation_matrix
ORACLES["numeric_correlation_matrix"] = _corr_sql()


# --------------------------------------------------------------------------
# Robust outlier audit (median / MAD)
# --------------------------------------------------------------------------
# Mean/stddev outlier rules break on the very rows they should catch
# (the outliers move the mean); the robust rule is |x - median| >
# 3 * 1.4826 * MAD. Both medians are LOWER medians over integer cents
# (rank (n+1)//2), so every comparison is exact integer arithmetic on
# both engines and the threshold is the rational 10000*|x-med| >
# 44478*mad — no float anywhere until the report's rate column.
# Scale shape: two nation-keyed window passes (25 balanced groups;
# each pass one keyed exchange) + a broadcast-sized group report. For
# high-cardinality or skewed groups the 100 TB swap is the two-pass
# histogram selection of exact_median_twopass per group — same
# semantics, no per-group sort.

_MAD_SCALE_NUM = 44478   # 3 * 1.4826 * 10^4  (consistency constant)
_MAD_SCALE_DEN = 10000


def mad_outlier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation robust outlier audit of order totals: n_orders,
    lower-median cents, MAD cents, outlier count and rate under the
    3-sigma-equivalent MAD rule."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    x = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(F.col("c_nationkey").alias("nationkey"), "pc")
    )
    w = Window.partitionBy("nationkey").orderBy("pc")
    med = (
        x.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("nationkey")))
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("nationkey", F.col("pc").alias("med"), "n")
    )
    dev = x.join(med, "nationkey").select(
        "nationkey", "pc", "med", F.abs(F.col("pc") - F.col("med")).alias("ad")
    )
    wd = Window.partitionBy("nationkey").orderBy("ad")
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .join(med.select("nationkey", "n"), "nationkey")
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("nationkey", F.col("ad").alias("mad"))
    )
    flagged = dev.join(mad, "nationkey").withColumn(
        "is_outlier",
        _MAD_SCALE_DEN * F.col("ad") > _MAD_SCALE_NUM * F.col("mad"),
    )
    return (
        flagged.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.first("med").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        )
        .select(
            "nationkey",
            "n_orders",
            "median_cents",
            "mad_cents",
            "n_outliers",
            F.round(
                F.col("n_outliers") / F.col("n_orders").cast("double"), 6
            ).alias("outlier_rate"),
        )
        .orderBy("nationkey")
    )


MAD_OUTLIER_SQL = f"""
WITH x AS (
    SELECT c.c_nationkey AS nationkey,
           round(o.o_totalprice * 100)::BIGINT AS pc
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
    SELECT nationkey, pc,
           row_number() OVER (PARTITION BY nationkey ORDER BY pc) AS rn,
           count(*) OVER (PARTITION BY nationkey) AS n
    FROM x
),
med AS (
    SELECT nationkey, pc AS med, n
    FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
    SELECT x.nationkey, x.pc, m.med, abs(x.pc - m.med) AS ad, m.n
    FROM x JOIN med m ON m.nationkey = x.nationkey
),
dev_ranked AS (
    SELECT nationkey, ad, n,
           row_number() OVER (PARTITION BY nationkey ORDER BY ad) AS rn
    FROM dev
),
mad AS (
    SELECT nationkey, ad AS mad
    FROM dev_ranked WHERE rn = (n + 1) // 2
)
SELECT d.nationkey,
       count(*)::BIGINT AS n_orders,
       any_value(d.med) AS median_cents,
       any_value(m.mad) AS mad_cents,
       sum(CASE WHEN {_MAD_SCALE_DEN} * d.ad > {_MAD_SCALE_NUM} * m.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       round(sum(CASE WHEN {_MAD_SCALE_DEN} * d.ad
                          > {_MAD_SCALE_NUM} * m.mad
                      THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
           AS outlier_rate
FROM dev d JOIN mad m ON m.nationkey = d.nationkey
GROUP BY d.nationkey
ORDER BY d.nationkey
"""

QUERIES["mad_outlier_report"] = mad_outlier_report
ORACLES["mad_outlier_report"] = MAD_OUTLIER_SQL


# --------------------------------------------------------------------------
# Differential-privacy release (Dwork, McSherry, Nissim & Smith,
# "Calibrating Noise to Sensitivity in Private Data Analysis", TCC
# 2006) — the FOURTH privacy gate beside the k-anonymity /
# l-diversity / t-closeness audit triad: those three judge whether a
# grouped VIEW is safe to publish as-is; this one PUBLISHES a
# histogram under an epsilon budget by adding two-sided-geometric
# noise (the discrete Laplace — Ghosh, Roughgarden & Sundararajan,
# "Universally Utility-Maximizing Privacy Mechanisms", STOC 2009,
# the optimal mechanism for sensitivity-1 integer counts).
#
# Engine determinism: the noise draw u for each cell is the shared
# cross-engine scrambled hash of the cell key over a FIXED, PUBLISHED
# seed string — which makes the mechanism reproducible and
# oracle-checkable but NOT actually private (a published seed lets
# anyone subtract the noise). This is the library/testing form; a
# production release swaps the seed literal for a fresh secret drawn
# per release, changing nothing else. The inverse-CDF mapping uses a
# PRECOMPUTED INTEGER threshold table embedded as literals in both
# engines (the _NDCG_DISC convention), so no libm exp/log runs at
# query time and the noise is integer-exact on both sides.
# --------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_K = 20  # clamp support to [-K, K]; tail mass ~ 2*alpha^(K+1)/(1+alpha) ~ 3e-5


def _dp_thresholds() -> list[int]:
    """Integer inverse-CDF thresholds for the two-sided geometric
    distribution P(k) ∝ alpha^|k| with alpha = exp(-eps), over the
    scrambled-hash domain [0, HASH_MOD): noise(u) = -K + |{t : t <= u}|.
    Computed once in Python, embedded as literals in both engines."""
    import math

    from ..operators import text as T

    alpha = math.exp(-_DP_EPS)
    p0 = (1 - alpha) / (1 + alpha)
    cdf, out = 0.0, []
    for j in range(-_DP_K, _DP_K):
        cdf += p0 * alpha ** abs(j)
        out.append(int(cdf * T.HASH_MOD))
    return out


_DP_THRESH = _dp_thresholds()


def dp_release_from_counts(counts: DataFrame) -> DataFrame:
    """The release readout over any (event_type, ym) -> n cell
    relation — shared by the batch query below and the streaming
    maintained-counts twin (``stream_dp_release``), whose additive
    keyed state equals the batch cells for any batch split. Noise is a
    pure function of the CELL KEY (not the count), so the stream and
    the batch release identical noise for identical keys."""
    from ..operators import text as T

    u = T.scrambled_hash(
        F.concat(
            F.lit("dp:"),
            F.col("event_type"),
            F.lit(":"),
            F.col("ym").cast("string"),
        )
    )
    thresh = F.array(*[F.lit(t) for t in _DP_THRESH])
    noise = (
        F.size(F.filter(thresh, lambda t: t <= u)) - F.lit(_DP_K)
    ).cast("long")
    return counts.select(
        "event_type",
        "ym",
        F.col("n").alias("true_count"),
        noise.alias("noise"),
        (F.col("n") + noise).alias("released_count"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("event_type", "ym")


def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-level eps-DP release of the (event_type, month) event
    histogram: disjoint counting cells, sensitivity 1 (adding or
    removing one event changes exactly one cell by 1), so one noisy
    draw per cell exhausts the whole epsilon budget by parallel
    composition. The report keeps ``true_count``/``noise`` beside the
    release as the internal audit grain — the publishable artifact is
    (event_type, ym, released_count, epsilon) only. Negative releases
    are legitimate mechanism outputs (clamping is allowed
    post-processing but loses the unbiasedness the audit checks).

    Plan: one map-side-combinable count aggregate to the cell grain,
    then pure per-row expressions — aggregate-sized at any corpus
    scale."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        (F.year("ts") * 100 + F.month("ts")).cast("long").alias("ym"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return dp_release_from_counts(counts)


def _dp_sql() -> str:
    from .sketches import _scrambled_hash_sql

    thresh = ", ".join(str(t) for t in _DP_THRESH)
    u = _scrambled_hash_sql("'dp:' || event_type || ':' || ym")
    return f"""
WITH cells AS (
    SELECT event_type,
           (year(ts) * 100 + month(ts))::BIGINT AS ym,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
), noised AS (
    SELECT event_type, ym, n,
           (len(list_filter([{thresh}], t -> t <= {u}))
            - {_DP_K})::BIGINT AS noise
    FROM cells
)
SELECT event_type, ym,
       n AS true_count,
       noise,
       (n + noise)::BIGINT AS released_count,
       {_DP_EPS} AS epsilon
FROM noised
ORDER BY event_type, ym
"""


QUERIES["dp_noisy_histogram"] = dp_noisy_histogram
ORACLES["dp_noisy_histogram"] = _dp_sql()
