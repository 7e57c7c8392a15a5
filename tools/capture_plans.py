"""Capture .explain("formatted") for declared + bench queries.

Writes plans/<tag>/<query>_<suffix>.txt for every named query (default:
every batch query on the declared surface plus the bench HEADLINE/HEAVY
sets). Streaming replay queries (stream_*) EXECUTE their replay inside
the query function, so they are skipped unless named explicitly — their
returned DataFrame is just the final store read and the interesting
plans are the per-batch kernels, which the batch twins cover.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" / "after" (file name suffix)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from m4i_flink_tasks_spark.queries import extra_queries  # noqa: E402
from m4i_flink_tasks_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_TAG", "r11"),
)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench

    queries = {**entry.queries(), **extra_queries()}
    if only:
        names = only
    else:
        names = [n for n in entry.queries() if not n.startswith("stream_")]
        names += [
            n
            for n in bench.HEADLINE + bench.HEAVY
            if n not in names and not n.startswith("stream_")
        ]

    spark = get_spark("plan-capture")
    # MATERIALIZE_STRATEGY=none dumps the full pre-checkpoint plan of
    # materialize()-using queries (r10 verdict: checkpointed queries
    # explain as `Scan ExistingRDD` tails, so before/after Exchange
    # accounting needs the unmaterialized shape too).
    strategy = os.environ.get("MATERIALIZE_STRATEGY")
    if strategy:
        spark.conf.set("spark.m4i.materialize.strategy", strategy)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        fn = queries[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR: {type(exc).__name__}: {exc}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        n_ex = text.count("Exchange")
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                    "CartesianProduct",
                )
                if j in text
            }
        )
        py = sorted(
            {
                p
                for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas", "FlatMapGroupsInPandas")
                if p in text
            }
        )
        print(f"{name}: Exchange={n_ex} joins={joins} python={py}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
