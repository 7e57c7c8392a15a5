"""Z-order layout: the file-skipping effect, measured from parquet
footer min/max statistics (the same stats a real reader prunes with).

A 2-D uniform grid written two ways: range-partitioned by x only
(the single-column sorted layout) vs by z(x, y). For a predicate
narrow in y and wide in x, the x-sorted layout cannot skip anything —
every file's y-range spans the domain — while the Morton layout keeps
files rectangular in (x, y), so most files' y-stats exclude the box.
"""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.zorder import z_value

GRID_BITS = 7  # 128 x 128 grid
N_FILES = 32


def _grid(spark):
    n = 1 << GRID_BITS
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("long").alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
    )


def _write(df, path, sort_col):
    (
        df.repartitionByRange(N_FILES, F.col(sort_col))
        .write.mode("overwrite")
        .parquet(path)
    )


def _files_overlapping_box(path, x_lo, x_hi, y_lo, y_hi):
    """Count files whose footer min/max stats intersect the box — the
    files any stats-based reader must open."""
    hit = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        xmin = ymin = None
        xmax = ymax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "x":
                    xmin = st.min if xmin is None else min(xmin, st.min)
                    xmax = st.max if xmax is None else max(xmax, st.max)
                if name == "y":
                    ymin = st.min if ymin is None else min(ymin, st.min)
                    ymax = st.max if ymax is None else max(ymax, st.max)
        assert None not in (xmin, xmax, ymin, ymax), f
        if xmax >= x_lo and xmin <= x_hi and ymax >= y_lo and ymin <= y_hi:
            hit += 1
    return hit


def test_zorder_layout_skips_files_on_the_second_dimension(spark):
    grid = _grid(spark).withColumn(
        "z", z_value("x", "y", GRID_BITS)
    )
    root = tempfile.mkdtemp(prefix="m4i_zorder_")
    linear = os.path.join(root, "by_x")
    morton = os.path.join(root, "by_z")
    _write(grid, linear, "x")
    _write(grid, morton, "z")

    # Narrow in y, wide in x: the x-sorted layout cannot skip.
    n = 1 << GRID_BITS
    box = dict(x_lo=0, x_hi=n - 1, y_lo=10, y_hi=13)
    linear_files = _files_overlapping_box(linear, **box)
    morton_files = _files_overlapping_box(morton, **box)
    total = len(glob.glob(os.path.join(linear, "part-*.parquet")))
    assert total >= N_FILES // 2
    assert linear_files == total, "x-sorted layout unexpectedly skipped"
    assert morton_files * 2 <= total, (
        f"z-order should prune at least half: {morton_files}/{total}"
    )

    # Both layouts return the same answer for the box.
    for path in (linear, morton):
        got = (
            spark.read.parquet(path)
            .filter(
                (F.col("y") >= box["y_lo"]) & (F.col("y") <= box["y_hi"])
            )
            .count()
        )
        assert got == (box["y_hi"] - box["y_lo"] + 1) * n


def test_z_value_matches_duckdb(spark):
    """The z mapping itself is cross-engine: the same shift/mask
    arithmetic in DuckDB produces identical values (so a z-clustered
    layout is reproducible by any engine in the pipeline)."""
    import duckdb

    from m4i_flink_tasks_spark.operators.zorder import z_sql_duckdb

    sdf = (
        _grid(spark)
        .filter((F.col("x") < 16) & (F.col("y") < 16))
        .withColumn("z", z_value("x", "y", 4))
        .select("x", "y", "z")
    )
    got = {(r.x, r.y): r.z for r in sdf.collect()}
    duck = duckdb.sql(
        "SELECT x, y, "
        + z_sql_duckdb("x", "y", 4)
        + " AS z FROM (SELECT (i % 16)::BIGINT AS x, (i // 16)::BIGINT"
        " AS y FROM range(256) t(i))"
    ).fetchall()
    exp = {(x, y): z for x, y, z in duck}
    assert got == exp
    # spot-check the interleave definition itself
    assert exp[(1, 0)] == 1 and exp[(0, 1)] == 2 and exp[(3, 5)] == 0b100111


def test_z_value_asymmetric_injective_and_cross_engine(spark):
    """Unequal bit budgets: a wide key (beyond 2**bits) paired with a
    bounded column must stay injective — high x bits sit above the
    interleaved prefix — and the DuckDB spelling must agree bit-for-bit."""
    import duckdb

    from m4i_flink_tasks_spark.operators.zorder import z_sql_duckdb

    # x spans far past 2**6; y is bounded like p_size (1..50)
    src = "(SELECT (i * 977)::BIGINT AS x, (i % 50 + 1)::BIGINT AS y" \
          " FROM range(2000) t(i))"
    duck = duckdb.sql(
        f"SELECT x, y, {z_sql_duckdb('x', 'y', 6, 26)} AS z FROM {src}"
    ).fetchall()
    zs = [z for _, _, z in duck]
    assert len(set(zs)) == len(zs)  # injective over the wide domain

    sdf = (
        spark.range(2000)
        .selectExpr("id * 977 AS x", "id % 50 + 1 AS y")
        .withColumn("z", z_value("x", "y", 6, x_bits=26))
    )
    got = {(r.x, r.y): r.z for r in sdf.collect()}
    exp = {(x, y): z for x, y, z in duck}
    assert got == exp
    # high-bit placement: x = 2**6 (first bit above the budget) lands
    # at position 2*6 = 12 exactly
    one_hi = duckdb.sql(
        f"SELECT {z_sql_duckdb('64', '0', 6, 26)}"
    ).fetchone()[0]
    assert one_hi == 1 << 12
