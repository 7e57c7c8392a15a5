"""Measure the cross-split leakage PAIR LAW across the scale ladder
(SCALE.md twentieth wave, r6 verdict item 6).

`cross_split_leakage` is output-bound: its wall tracks the corpus's
cross-split co-pair volume, not the plan. This tool measures that
volume directly WITHOUT materializing pairs: after the same
prefix-filter projection the query runs, the candidate workload is
    sum over tok of  |train prefix postings(tok)| * |eval prefix postings(tok)|
— one aggregate per SF, linear cost, no joins. It prints the measured
law sf0.1 -> sf1 -> sf10 so the projected wall at any scale is
read off the candidate curve (and bounded by tuning tau upward, which
shortens every prefix).

Usage: python tools/leakage_pair_law.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def candidate_volume(spark, sf_dir: str) -> tuple[int, int]:
    from m4i_flink_tasks_spark.operators import dedup as D
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        corpus_sampling_splits,
    )
    from m4i_flink_tasks_spark.queries.llm_decontam import (
        _LEAK_T_DEN,
        _LEAK_T_NUM,
    )
    from m4i_flink_tasks_spark.sources import load_table

    splits = corpus_sampling_splits(spark, sf_dir).select("doc_id", "split")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", D.shingles(F.col("text")).alias("sh")
    )
    toks = docs.join(splits, "doc_id").select(
        "doc_id", "split", F.explode("sh").alias("tok")
    )
    sizes = toks.groupBy("doc_id").agg(
        F.first("split").alias("split"), F.count(F.lit(1)).alias("n")
    )
    df_rel = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        toks.join(df_rel, "tok")
        .join(sizes.select("doc_id", "n"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("n")
            - F.expr(
                f"({_LEAK_T_NUM} * n + {_LEAK_T_DEN} - 1) "
                f"DIV {_LEAK_T_DEN}"
            )
            + 1
        )
        .select("split", "tok")
    )
    per_tok = prefix.groupBy("tok").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") != "train", 1).otherwise(0)).alias(
            "n_eval"
        ),
    )
    row = per_tok.agg(
        F.sum(F.col("n_train") * F.col("n_eval")).alias("cand"),
        F.sum(
            F.when(F.col("n_train") * F.col("n_eval") > 0, 1).otherwise(0)
        ).alias("hot_toks"),
    ).collect()[0]
    return int(row["cand"] or 0), int(row["hot_toks"] or 0)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/m4i_scale/sf1",
        "/tmp/m4i_scale/sf10",
    ]
    from m4i_flink_tasks_spark.session import get_spark

    spark = get_spark("m4i_leakage_pair_law")
    print("| sf_dir | candidate volume | hot toks | measure time (s) |")
    print("|---|---|---|---|")
    for d in dirs:
        t0 = time.perf_counter()
        cand, hot = candidate_volume(spark, d)
        dt = time.perf_counter() - t0
        print(f"| {d} | {cand} | {hot} | {dt:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
