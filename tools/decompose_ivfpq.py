"""Decompose ivfpq_adc_topk serving-path costs (throwaway probe)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries import llm_similarity as S
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.sources import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("decompose-ivfpq")


def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


emb = load_table(spark, sf_dir, "embeddings")
print(f"embeddings rows: {emb.count()}", flush=True)

t0 = time.perf_counter()
coarse, final, labeled = S._ivfpq_index(spark, sf_dir, emb)
print(f"index build (cold): {time.perf_counter() - t0:.3f}s", flush=True)

for trial in range(3):
    print(f"--- trial {trial}", flush=True)
    t0 = time.perf_counter()
    coarse, final, labeled = timed(
        "  index cache hit", lambda: S._ivfpq_index(spark, sf_dir, emb)
    )
    q = emb.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(
        F.col("embedding").alias("q_emb")
    )
    timed("  q collect-ish", lambda: q.count())
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
    timed("  probed", lambda: probed.count())
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
    timed("  lut", lambda: lut.count())
    per_s = (
        labeled.join(F.broadcast(lut), ["label", "s", "code"])
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
    out = (
        per_s.filter(F.col("vec_id") != S._QUERY_VEC_ID)
        .select("vec_id", "label", total.alias("approx_dist"))
        .orderBy("approx_dist", "vec_id")
        .limit(S._TOPK)
    )
    timed("  per_s+final", lambda: out.count())
    print(f"  TRIAL TOTAL: {time.perf_counter() - t0:.3f}s", flush=True)

# full-query timing as the bench sees it
for trial in range(3):
    t0 = time.perf_counter()
    n = S.ivfpq_adc_topk(spark, sf_dir).count()
    print(
        f"full query run: {time.perf_counter() - t0:.3f}s ({n} rows)",
        flush=True,
    )

spark.stop()
