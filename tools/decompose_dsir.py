"""DSIR phase decomposition (throwaway probe)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from m4i_flink_tasks_spark.queries import quality_classifier as Q
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("decompose-dsir")

def timed(label, fn):
    t0 = time.perf_counter(); r = fn()
    print(f"  {label}: {time.perf_counter()-t0:.3f}s", flush=True); return r

for trial in range(3):
    print(f"--- trial {trial}", flush=True)
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    feats = timed("feats localCheckpoint", lambda: Q._features(docs, Q.N_DSIR_BUCKETS).localCheckpoint())
    tgt_ids = docs.filter(F.col("source").isin(*Q._DSIR_TARGET)).select("doc_id")
    tgt_feats = feats.join(F.broadcast(tgt_ids), "doc_id")
    cq = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cq"))
    cp = tgt_feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cp"))
    nq = cq.agg(F.sum("cq").cast("double").alias("nq"))
    np_ = cp.agg(F.sum("cp").cast("double").alias("np"))
    b = float(Q.N_DSIR_BUCKETS)
    lam = (cq.join(cp, "bucket", "left").crossJoin(F.broadcast(nq)).crossJoin(F.broadcast(np_))
        .select("bucket", (F.log((F.coalesce(F.col("cp"), F.lit(0)) + 1) / (F.col("np") + b)) - F.log((F.col("cq") + 1) / (F.col("nq") + b))).alias("lam")))
    scored = (feats.join(F.broadcast(lam), "bucket").groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_features"), F.round(F.sum("lam"), 4).alias("log_w")))
    from m4i_flink_tasks_spark.operators import text as T
    u = (T.scrambled_hash(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))) + 1) / F.lit(float(T.HASH_MOD) + 1)
    out = timed("out localCheckpoint", lambda: (docs.select("doc_id", "source").join(scored, "doc_id")
        .withColumn("log_w_noisy", F.round(F.col("log_w") - F.log(-F.log(u)), 4)).localCheckpoint()))
    topk = out.orderBy(F.desc("log_w"), "doc_id").limit(Q._DSIR_K).select("doc_id", F.lit(True).alias("sel"))
    gumbel_topk = out.orderBy(F.desc("log_w_noisy"), "doc_id").limit(Q._DSIR_K).select("doc_id", F.lit(True).alias("gsel"))
    final = (out.join(F.broadcast(topk), "doc_id", "left").join(F.broadcast(gumbel_topk), "doc_id", "left")
        .select("doc_id", "source", "n_features", "log_w",
                F.coalesce(F.col("sel"), F.lit(False)).alias("selected"), "log_w_noisy",
                F.coalesce(F.col("gsel"), F.lit(False)).alias("gumbel_selected")).orderBy("doc_id"))
    timed("final count", lambda: final.count())
    print(f"  TRIAL TOTAL: {time.perf_counter()-t0:.3f}s", flush=True)
spark.stop()
