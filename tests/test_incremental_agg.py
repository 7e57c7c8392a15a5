"""Incremental view maintenance: the streamed q1 view must equal the
batch aggregate over all data seen, and survive replay + mid-stream
restart (addition is associative/commutative; double parts agree after
the batch query's own rounding)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.relational import q1_pricing_summary
from m4i_flink_tasks_spark.streaming.incremental_agg import (
    run_incremental_pricing_summary,
    stage_lineitem,
)


def test_incremental_view_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_")
    inc = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    bat = sorted(map(tuple, q1_pricing_summary(spark, sf_dir).collect()))
    assert inc == bat


def test_incremental_view_replay_idempotent(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_replay_")
    first = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    second = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    assert first == second


def test_incremental_view_mid_stream_restart(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_restart_")
    staging = stage_lineitem(
        spark, sf_dir, os.path.join(wd, "staging_lineitem"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_ivm_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_incremental_pricing_summary(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    bat = sorted(map(tuple, q1_pricing_summary(spark, sf_dir).collect()))
    assert final == bat


def test_retract_stream_nets_out(spark, sf_dir):
    """Flink-style retract stream: inserts then retractions of the
    orderkey%10==3 slice must leave the view equal to the batch
    aggregate over the surviving rows — a retraction is just a negative
    delta through the same additive combine."""
    from pyspark.sql import functions as F

    from m4i_flink_tasks_spark.sources import load_table
    from m4i_flink_tasks_spark.streaming.incremental_agg import (
        RETRACT_ORDERKEY_MOD,
        RETRACT_ORDERKEY_REM,
        run_incremental_with_retractions,
    )

    wd = tempfile.mkdtemp(prefix="m4i_ivm_retract_")
    got = sorted(
        map(
            tuple,
            run_incremental_with_retractions(spark, sf_dir, wd).collect(),
        )
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % RETRACT_ORDERKEY_MOD != RETRACT_ORDERKEY_REM
    )
    expected = sorted(
        map(
            tuple,
            li.filter(
                F.col("l_shipdate")
                <= F.lit("1998-09-02").cast("timestamp")
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias(
                    "sum_base_price"
                ),
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    2,
                ).alias("sum_disc_price"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .collect(),
        )
    )
    # Insert-then-subtract leaves float residue the never-added batch
    # path doesn't have, which can flip a value sitting exactly on the
    # round() boundary (observed: half a cent on a 2.2e7 sum). Group
    # keys and counts must be exact; each double must agree within one
    # rounding quantum.
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g[0] == e[0] and g[1] == e[1] and g[6] == e[6], (g, e)
        for i, tol in ((2, 0.011), (3, 0.011), (4, 0.011), (5, 2e-6)):
            assert abs(g[i] - e[i]) <= tol, (i, g, e)


def test_backfill_then_stream_equals_batch(spark, sf_dir):
    """Kappa migration: batch bootstrap over history + streaming tail
    must equal the batch aggregate over all data, and re-running the
    composition must be a no-op."""
    from m4i_flink_tasks_spark.streaming.incremental_agg import (
        run_backfill_then_stream,
    )

    wd = tempfile.mkdtemp(prefix="m4i_ivm_kappa_")
    got = sorted(
        map(tuple, run_backfill_then_stream(spark, sf_dir, wd).collect())
    )
    bat = sorted(map(tuple, q1_pricing_summary(spark, sf_dir).collect()))
    assert got == bat
    again = sorted(
        map(tuple, run_backfill_then_stream(spark, sf_dir, wd).collect())
    )
    assert again == got
