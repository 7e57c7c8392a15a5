"""A/B the ivfpq serving path: current chained-broadcast plan vs
collect-the-KB-sized-LUT-then-one-action (throwaway probe)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries import llm_similarity as S
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-ivfpq")

emb = load_table(spark, sf_dir, "embeddings")
coarse, final, labeled = S._ivfpq_index(spark, sf_dir, emb)  # warm build


def variant_b():
    q = emb.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    qdist = F.round(
        F.aggregate(
            F.zip_with(
                F.transform(F.col("q_emb"), lambda x: x.cast("double")),
                F.col("ccent"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    probed = (
        coarse.crossJoin(F.broadcast(q))
        .select("label", "ccent", "q_emb", qdist.alias("d"))
        .orderBy("d", "label")
        .limit(S._IVFPQ_NPROBE)
    )
    qr_subs = S._pq_subvectors(
        probed.select(
            "label", S._residual(F.col("q_emb"), F.col("ccent")).alias("qr")
        ),
        id_col="label",
        emb_col="qr",
    ).withColumnRenamed("sub", "qsub")
    lut = final.join(F.broadcast(qr_subs), "s").select(
        "label",
        "s",
        "code",
        F.round(S._pq_sqdist(F.col("qsub"), F.col("cent")), 6).alias("ld"),
    )
    lut_local = spark.createDataFrame(
        lut.collect(), "label int, s int, code int, ld double"
    )
    per_s = (
        labeled.join(F.broadcast(lut_local), ["label", "s", "code"])
        .groupBy("vec_id")
        .agg(
            F.max("label").alias("label"),
            *[
                F.max(F.when(F.col("s") == s, F.col("ld"))).alias(f"l{s}")
                for s in range(S._PQ_M)
            ],
        )
    )
    total = F.round(
        sum((F.col(f"l{s}") for s in range(S._PQ_M)), F.lit(0.0)), 6
    )
    return (
        per_s.filter(F.col("vec_id") != S._QUERY_VEC_ID)
        .select("vec_id", "label", total.alias("approx_dist"))
        .orderBy("approx_dist", "vec_id")
        .limit(S._TOPK)
    )


for trial in range(4):
    t0 = time.perf_counter()
    rows_a = S.ivfpq_adc_topk(spark, sf_dir).collect()
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows_b = variant_b().collect()
    tb = time.perf_counter() - t0
    same = [tuple(r) for r in rows_a] == [tuple(r) for r in rows_b]
    print(f"trial {trial}: A={ta:.3f}s B={tb:.3f}s identical={same}", flush=True)

spark.stop()
