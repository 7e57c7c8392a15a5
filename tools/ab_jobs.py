"""Steal-robust A/B probe: per-query Spark JOB COUNT and JVM CPU time.

Wall-clock on a contended host mixes code cost with CPU steal; the two
quantities here do not. Job count comes from the status tracker (every
scheduled job increments the id space), CPU seconds from /proc of the
driver JVM (which in local mode is the whole cluster).

Usage: python tools/ab_jobs.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, RUNS (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m4i_flink_tasks_spark.queries import all_queries, extra_queries
from m4i_flink_tasks_spark.session import get_spark


def _jvm_cpu_seconds() -> float:
    """Total CPU seconds of every java child of this process tree."""
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / hz  # utime+stime
        except OSError:
            continue
    return total


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "2"))
    spark = get_spark("ab-jobs")
    queries = {**all_queries(), **extra_queries()}
    sc = spark.sparkContext

    from m4i_flink_tasks_spark.sources import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    def n_jobs() -> int:
        # next unassigned job id — monotone over ALL jobs regardless of
        # job group (streaming sinks set their own groups).
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    out = {}
    for name in sys.argv[1:]:
        fn = queries[name]
        fn(spark, sf_dir).count()  # warm plan/codegen
        best = None
        for _ in range(runs):
            j0, c0, t0 = n_jobs(), _jvm_cpu_seconds(), time.perf_counter()
            fn(spark, sf_dir).count()
            rec = {
                "jobs": n_jobs() - j0,
                "cpu_s": round(_jvm_cpu_seconds() - c0, 2),
                "wall_s": round(time.perf_counter() - t0, 2),
            }
            if best is None or rec["cpu_s"] < best["cpu_s"]:
                best = rec
        out[name] = best
        print(f"# {name}: {best}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
