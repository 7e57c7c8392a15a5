"""Mirror of the driver's correctness gate: every queries() entry with an
oracle must match DuckDB exactly at the smoke scale factor.

Run against sf0.01 (the driver's gate SF) with
``SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import pytest

from m4i_flink_tasks_spark.queries import (
    DRIVER_QUERIES,
    all_oracles,
    all_queries,
    extra_oracles,
    extra_queries,
)

from .oracle_harness import compare

QUERIES = {**all_queries(), **extra_queries()}
ORACLES = {**all_oracles(), **extra_oracles()}


def test_driver_surface_is_fully_verified():
    """Every declared driver query must have an oracle — the driver gate
    hashes all of them, so nothing on the declared surface is unproven."""
    declared = all_queries()
    assert list(declared) == list(DRIVER_QUERIES)
    missing = set(declared) - set(all_oracles())
    # Streaming-stateful queries may be rows-only checked; keep the
    # exception list explicit and small.
    assert missing <= set(), f"declared queries without oracle: {sorted(missing)}"


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    ok, msg = compare(spark, QUERIES[name], ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
