"""Time one or more queries bench-style (3 runs, min, count action).

Usage: python tools/time_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, RUNS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m4i_flink_tasks_spark.queries import all_queries, extra_queries
from m4i_flink_tasks_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "3"))
    names = sys.argv[1:]
    spark = get_spark("time-query")
    queries = {**all_queries(), **extra_queries()}

    from m4i_flink_tasks_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    out = {}
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm plan/codegen
        per = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            per.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(per), "runs": per, "rows": n}
        print(f"# {name}: min {min(per):.3f}s of {per} ({n} rows)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
