"""sf0.1 -> sf10 (100x) ladder runner — SCALE.md methodology.

Same warm-run best-of-2 convention as scale_rehearsal.py, but against
the synthesized sf10 (make_scale_data.py 10 applied to the sf1 output).
Usage:

    python tools/scale_ladder_sf10.py query_a query_b ...
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1_DIR = "/tmp/m4i_scale/sf1"
SF10_DIR = "/tmp/m4i_scale/sf10"


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: scale_ladder_sf10.py <query> [<query> ...]")
    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, "tools/make_scale_data.py", "10",
             "/root/testdata/sf0.1", SF1_DIR],
            check=True,
        )
    if not os.path.exists(os.path.join(SF10_DIR, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, "tools/make_scale_data.py", "10",
             SF1_DIR, SF10_DIR],
            check=True,
        )

    from m4i_flink_tasks_spark.queries import all_queries, extra_queries
    from m4i_flink_tasks_spark.session import get_spark

    spark = get_spark("m4i_scale_ladder")
    queries = {**all_queries(), **extra_queries()}
    results: dict[str, list[float]] = {}
    for sf_dir in ("/root/testdata/sf0.1", SF10_DIR):
        from m4i_flink_tasks_spark.sources import TABLES, load_table

        for t in TABLES:
            load_table(spark, sf_dir, t).count()
        for name in names:
            fn = queries[name]
            fn(spark, sf_dir).count()  # warm: compile plans + page cache
            best = float("inf")
            for _ in range(2):
                spark.sparkContext._jvm.System.gc()
                start = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - start)
            results.setdefault(name, []).append(best)
            print(f"# {name} @ {sf_dir}: {best:.2f}s", file=sys.stderr, flush=True)

    print("| query | sf0.1 (s) | sf10 (s) | 100x data -> |")
    print("|---|---|---|---|")
    for name, (small, big) in results.items():
        print(f"| `{name}` | {small:.2f} | {big:.2f} | {big / small:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
