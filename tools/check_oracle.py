"""Local replica of the driver's correctness gate.

Runs every entry of ``__spark_entry__.queries()`` against its
``oracle_sql()`` twin on the same parquet tables (default sf0.01) and
compares row count, schema width, and a canonicalized value hash the
same way the driver does: columns sorted by name, rows sorted by all
columns, floats rounded, then hashed.  Array/map columns would make the
pandas sort raise ``TypeError: unhashable type: 'list'`` exactly like
the driver's harness, so this catches boundary-serialization bugs too.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""
from __future__ import annotations

import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ONE canonicalizer for the pre-flight tool and the pytest gate — any
# drift between the two would let a dtype mismatch hide again (the 8
# HUGEINT-sum oracles were exactly that failure mode).
from tests.oracle_harness import canonical_hash as _canon  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    if only:
        # Named queries may be extras (pytest-pinned, not declared) —
        # pull those in too so new work can be pre-flighted by name.
        from m4i_flink_tasks_spark.queries import extra_oracles, extra_queries

        queries = {**queries, **extra_queries()}
        oracles = {**oracles, **extra_oracles()}
        unknown = only - set(queries)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                rec["hash_match"] = (
                    rec["schema_match"] and _canon(sdf) == _canon(odf)
                )
                ok = rec["rows_match"] and rec["hash_match"]
            else:
                rec["oracle_rows"] = None
                ok = rec["spark_rows"] >= 0
            rec["err"] = None
        except Exception as exc:  # noqa: BLE001 - report, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
            ok = False
        if not ok:
            n_bad += 1
            print(f"FAIL {name}: {json.dumps(rec)[:400]}", flush=True)
        else:
            print(f"ok   {name} rows={rec['spark_rows']}", flush=True)
        results[name] = rec

    print(f"\n{len(results) - n_bad}/{len(results)} green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
