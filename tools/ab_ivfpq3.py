"""ivfpq freeze-layout A/B: 32-slice createDataFrame vs numSlices=1 vs pandas LocalRelation."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pandas as pd
from pyspark.sql import functions as F
from m4i_flink_tasks_spark.queries import llm_similarity as S
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-ivfpq3")
emb = load_table(spark, sf_dir, "embeddings")
coarse0, final0, labeled = S._ivfpq_index(spark, sf_dir, emb)

coarse_rows = coarse0.collect(); final_rows = final0.collect()
variants = {}
variants["A_32slice"] = (coarse0, final0)
variants["B_pandas"] = (
    spark.createDataFrame(pd.DataFrame([(r.label, list(r.ccent)) for r in coarse_rows], columns=["label","ccent"]), "label int, ccent array<double>"),
    spark.createDataFrame(pd.DataFrame([(r.s, r.code, list(r.cent)) for r in final_rows], columns=["s","code","cent"]), "s int, code int, cent array<double>"),
)
variants["C_1slice"] = (
    spark.createDataFrame(spark.sparkContext.parallelize(coarse_rows, 1), "label int, ccent array<double>"),
    spark.createDataFrame(spark.sparkContext.parallelize(final_rows, 1), "s int, code int, cent array<double>"),
)
for name, (coarse, final) in variants.items():
    print(f"{name}: coarse plan = {coarse._jdf.queryExecution().optimizedPlan().nodeName()}", flush=True)

def serve(coarse, final):
    q = emb.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(F.col("embedding").alias("q_emb"))
    qdist = F.round(F.aggregate(F.zip_with(F.transform(F.col("q_emb"), lambda x: x.cast("double")), F.col("ccent"), lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, v: acc + v), 6)
    probed = (coarse.crossJoin(F.broadcast(q)).select("label", "ccent", "q_emb", qdist.alias("d")).orderBy("d", "label").limit(S._IVFPQ_NPROBE))
    qr_subs = S._pq_subvectors(probed.select("label", S._residual(F.col("q_emb"), F.col("ccent")).alias("qr")), id_col="label", emb_col="qr").withColumnRenamed("sub", "qsub")
    lut = final.join(F.broadcast(qr_subs), "s").select("label", "s", "code", F.round(S._pq_sqdist(F.col("qsub"), F.col("cent")), 6).alias("ld"))
    per_s = (labeled.join(F.broadcast(lut), ["label", "s", "code"]).groupBy("vec_id").agg(F.max("label").alias("label"), *[F.max(F.when(F.col("s") == s, F.col("ld"))).alias(f"l{s}") for s in range(S._PQ_M)]))
    total = F.round(sum((F.col(f"l{s}") for s in range(S._PQ_M)), F.lit(0.0)), 6)
    return (per_s.filter(F.col("vec_id") != S._QUERY_VEC_ID).select("vec_id", "label", total.alias("approx_dist")).orderBy("approx_dist", "vec_id").limit(S._TOPK))

base = None
for rnd in range(3):
    for name, (coarse, final) in variants.items():
        t0 = time.perf_counter(); rows = serve(coarse, final).collect(); dt = time.perf_counter() - t0
        key = [tuple(r) for r in rows]
        if base is None: base = key
        print(f"round {rnd} {name}: {dt:.3f}s identical={key == base}", flush=True)
spark.stop()
