"""Decompose cross_split_leakage stage costs at sf0.1 (throwaway probe).

Matches the CURRENT fused implementation in queries/llm_decontam.py:
inline split exprs + localCheckpoint materialization points. Timing
each checkpoint gives the per-phase cost the bench total is made of.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators import dedup as D
from m4i_flink_tasks_spark.queries.llm_corpus import sampling_split_exprs
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("decompose-csl")
load_table(spark, sf_dir, "documents").count()

T_NUM, T_DEN = 3, 5


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


for trial in range(3):
    print(f"--- trial {trial}")
    _, sample_bucket, rate, split = sampling_split_exprs()
    from m4i_flink_tasks_spark.operators.spread import spread_for_compute

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents")
        .filter(sample_bucket < rate)
        .select("doc_id", "lang", "text")
    ).select("doc_id", split.alias("split"), D.shingles(F.col("text")).alias("sh"))
    toks_lazy = docs.select(
        "doc_id", "split", F.explode_outer("sh").alias("tok")
    ).filter(F.col("tok").isNotNull())
    toks = timed("toks localCheckpoint", lambda: toks_lazy.localCheckpoint())
    sizes_l = toks.groupBy("doc_id").agg(
        F.first("split").alias("split"), F.count(F.lit(1)).alias("n")
    )
    sizes = timed("sizes localCheckpoint", lambda: sizes_l.localCheckpoint())
    df_rel = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix_l = (
        toks.join(df_rel, "tok")
        .join(sizes.select("doc_id", "n"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("n") - F.expr(f"({T_NUM} * n + {T_DEN} - 1) DIV {T_DEN}") + 1
        )
        .select("doc_id", "split", "tok", "n")
    )
    prefix = timed("prefix localCheckpoint", lambda: prefix_l.localCheckpoint())
    pa = prefix.filter(F.col("split") == "train").alias("pa")
    pb = prefix.filter(F.col("split") != "train").alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.tok") == F.col("pb.tok"))
            & (T_DEN * F.col("pb.n") >= T_NUM * F.col("pa.n"))
            & (T_DEN * F.col("pa.n") >= T_NUM * F.col("pb.n")),
        )
        .select(
            F.col("pa.doc_id").alias("id_train"),
            F.col("pb.doc_id").alias("id_eval"),
        )
        .distinct()
    )
    co = (
        cand.join(
            toks.select(F.col("doc_id").alias("id_train"), "tok"), "id_train"
        )
        .join(
            toks.select(F.col("doc_id").alias("id_eval"), "tok"),
            ["id_eval", "tok"],
        )
        .groupBy("id_train", "id_eval")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    timed("co+final noop", lambda: noop(co))

spark.stop()
