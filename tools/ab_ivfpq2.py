"""Finer ivfpq serving attribution (throwaway probe)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from m4i_flink_tasks_spark.queries import llm_similarity as S
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-ivfpq2")
emb = load_table(spark, sf_dir, "embeddings")
coarse, final, labeled = S._ivfpq_index(spark, sf_dir, emb)

def serve_tail(lut_local):
    per_s = (
        labeled.join(F.broadcast(lut_local), ["label", "s", "code"])
        .groupBy("vec_id")
        .agg(
            F.max("label").alias("label"),
            *[F.max(F.when(F.col("s") == s, F.col("ld"))).alias(f"l{s}") for s in range(S._PQ_M)],
        )
    )
    total = F.round(sum((F.col(f"l{s}") for s in range(S._PQ_M)), F.lit(0.0)), 6)
    return (
        per_s.filter(F.col("vec_id") != S._QUERY_VEC_ID)
        .select("vec_id", "label", total.alias("approx_dist"))
        .orderBy("approx_dist", "vec_id")
        .limit(S._TOPK)
    )

def build_lut():
    q = emb.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(F.col("embedding").alias("q_emb"))
    qdist = F.round(
        F.aggregate(
            F.zip_with(F.transform(F.col("q_emb"), lambda x: x.cast("double")), F.col("ccent"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, v: acc + v), 6)
    probed = (coarse.crossJoin(F.broadcast(q)).select("label", "ccent", "q_emb", qdist.alias("d")).orderBy("d", "label").limit(S._IVFPQ_NPROBE))
    qr_subs = S._pq_subvectors(
        probed.select("label", S._residual(F.col("q_emb"), F.col("ccent")).alias("qr")), id_col="label", emb_col="qr"
    ).withColumnRenamed("sub", "qsub")
    return final.join(F.broadcast(qr_subs), "s").select(
        "label", "s", "code", F.round(S._pq_sqdist(F.col("qsub"), F.col("cent")), 6).alias("ld"))

for trial in range(4):
    t0 = time.perf_counter(); rows = build_lut().collect(); t1 = time.perf_counter()
    lut_local = spark.createDataFrame(rows, "label int, s int, code int, ld double")
    n = serve_tail(lut_local).count(); t2 = time.perf_counter()
    print(f"trial {trial}: lut.collect={t1-t0:.3f}s tail={t2-t1:.3f}s", flush=True)

print("--- AQE off", flush=True)
spark.conf.set("spark.sql.adaptive.enabled", "false")
for trial in range(4):
    t0 = time.perf_counter(); rows = build_lut().collect(); t1 = time.perf_counter()
    lut_local = spark.createDataFrame(rows, "label int, s int, code int, ld double")
    n = serve_tail(lut_local).count(); t2 = time.perf_counter()
    print(f"trial {trial}: lut.collect={t1-t0:.3f}s tail={t2-t1:.3f}s", flush=True)
spark.conf.set("spark.sql.adaptive.enabled", "true")
print("--- full query, AQE on, repeated", flush=True)
for trial in range(3):
    t0 = time.perf_counter(); S.ivfpq_adc_topk(spark, sf_dir).count(); print(f"full: {time.perf_counter()-t0:.3f}s", flush=True)
spark.stop()
