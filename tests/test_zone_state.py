"""Streaming zone-map / file-inventory state: sum + min/max folds must
equal the batch inventory for any batch split and across a mid-stream
restart (all three are commutative monoids)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.warehouse import (
    _FILE_ROW_BYTES,
    _ZONE_HI,
    _ZONE_LO,
    _file_inventory,
)
from m4i_flink_tasks_spark.streaming.zone_state import (
    run_stream_zone_map_state,
    stage_file_rows,
)


def _batch_expected(spark, sf_dir):
    inv = _file_inventory(spark, sf_dir)
    prunable = (F.col("max_price") < _ZONE_LO) | (F.col("min_price") > _ZONE_HI)
    return sorted(
        map(
            tuple,
            inv.select(
                "part_key",
                "file_id",
                "size_bytes",
                "min_price",
                "max_price",
                prunable.alias("prunable"),
            ).collect(),
        )
    )


def test_stream_equals_batch_inventory(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_zone_")
    got = sorted(
        map(tuple, run_stream_zone_map_state(spark, sf_dir, wd).collect())
    )
    exp = _batch_expected(spark, sf_dir)
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_zone_restart_")
    staging = stage_file_rows(
        spark, sf_dir, os.path.join(wd, "staging_files"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_zone_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_zone_map_state(spark, sf_dir, wd)
    assert partial.count() > 0  # some state exists from the first file

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_zone_map_state(spark, sf_dir, wd).collect())
    )
    assert final == _batch_expected(spark, sf_dir)
