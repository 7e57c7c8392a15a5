"""Driver-contract hardening: the probes a harness actually hits —
bad paths, unknown tables, repeated registry calls, and the
ns-timestamp conf ordering — must fail loudly or work, never corrupt.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from m4i_flink_tasks_spark.sources import load_table


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert len(df.collect()) >= 0
    assert df.columns


def test_registries_are_stable_across_calls():
    q1, q2 = entry.queries(), entry.queries()
    assert sorted(q1) == sorted(q2)
    o1, o2 = entry.oracle_sql(), entry.oracle_sql()
    assert o1 == o2
    # every declared query has an oracle twin
    assert set(o1) <= set(q1)


def test_unknown_table_raises_key_error(spark):
    with pytest.raises(Exception) as exc:
        load_table(spark, "/root/testdata/sf0.001", "no_such_table")
    assert "no_such_table" in str(exc.value)


def test_missing_sf_dir_fails_loudly(spark):
    with pytest.raises(Exception) as exc:
        load_table(spark, "/tmp/definitely/not/there", "orders").count()
    assert "PATH_NOT_FOUND" in str(exc.value) or "not/there" in str(exc.value)


def test_events_then_lineitem_conf_order(spark, sf_dir):
    """Reading the ns-timestamp events table first must not poison a
    later lineitem read (the nanosAsLong conf is scoped to the loader's
    floor-conversion, not left dangling on the session)."""
    ev = load_table(spark, sf_dir, "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    li = load_table(spark, sf_dir, "lineitem")
    assert li.schema["l_shipdate"].dataType.typeName() == "timestamp"
    assert ev.count() > 0 and li.count() > 0
