"""Streaming incremental OLS: the additive (nation, month) cents state
must reproduce the per-row-cents batch trend EXACTLY for any batch
split and across a mid-stream restart (integer sums — a commutative
monoid — so the split cannot matter), with all float arithmetic
confined to the readout."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import duckdb

from m4i_flink_tasks_spark.queries.pipelines import STREAM_TREND_SQL
from m4i_flink_tasks_spark.streaming.regression_state import (
    run_stream_trend_slopes,
)

_TABLES = ("orders", "customer", "nation")


def _oracle_rows(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return sorted(map(tuple, con.execute(STREAM_TREND_SQL).fetchall()))


def test_stream_equals_batch_oracle(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_trend_")
    got = sorted(
        map(tuple, run_stream_trend_slopes(spark, sf_dir, wd).collect())
    )
    assert got == _oracle_rows(sf_dir) and got


def test_mid_stream_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.regression_state import (
        stage_order_revenue,
    )

    wd = tempfile.mkdtemp(prefix="m4i_trend_restart_")
    staging = stage_order_revenue(
        spark, sf_dir, os.path.join(wd, "staging_orders"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_trend_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_trend_slopes(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_trend_slopes(spark, sf_dir, wd).collect())
    )
    assert final == _oracle_rows(sf_dir)
