"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY.md §2 plus
the north-star LLM-pipeline extensions) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from m4i_flink_tasks_spark.queries import all_oracles, all_queries  # noqa: E402
from m4i_flink_tasks_spark.session import ensure_workers_can_import  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shaped pricing summary at sf0.001."""
    from m4i_flink_tasks_spark.queries.relational import q1_pricing_summary

    ensure_workers_can_import(spark)
    return q1_pricing_summary(spark, _SF0001)


def _with_worker_imports(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Python-UDF-backed queries need the package on worker sys.path
        # regardless of the driver's cwd.
        ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_worker_imports(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
