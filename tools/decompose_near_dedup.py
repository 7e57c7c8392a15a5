"""Decompose stream_near_dedup phase costs at sf0.1 (throwaway probe).

Replicates run_stream_near_dedup with timing around each phase of
dedup_batch (extra .count() actions on the persisted relations force
materialization at a known point; totals stay comparable because the
persists are reused)."""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from m4i_flink_tasks_spark.operators.dedup import jaccard, minhash_frame
from m4i_flink_tasks_spark.session import get_spark
from m4i_flink_tasks_spark.streaming import near_dedup as ND
from m4i_flink_tasks_spark.streaming.corpus_ingest import (
    DOC_STREAM_SCHEMA,
    stage_documents,
)
from m4i_flink_tasks_spark.streaming.store import BucketedParquetUpsertStore

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("decompose-near-dedup")


def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


def instrumented_batch(band_store, sig_store, out_store, batch, batch_id):
    threshold = ND.JACCARD_THRESHOLD
    mh = minhash_frame(batch, "doc_id", "text", n=3).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    timed(f"  b{batch_id} mh materialize", lambda: mh.count())
    batch_bands = mh.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_key")
    )
    prior = band_store.current_for_keys(batch_bands)
    cand_prior = None
    if prior is not None:
        cand_prior = batch_bands.join(prior, ["band_idx", "band_key"]).select(
            F.explode("doc_ids").alias("id_a"),
            F.col("doc_id").alias("id_b"),
        )
    left = batch_bands.alias("l")
    right = batch_bands.alias("r")
    cand_batch = left.join(
        right,
        (F.col("l.band_idx") == F.col("r.band_idx"))
        & (F.col("l.band_key") == F.col("r.band_key"))
        & (F.col("l.doc_id") < F.col("r.doc_id")),
    ).select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
    cands = (
        (cand_batch if cand_prior is None else cand_prior.unionByName(cand_batch))
        .dropDuplicates(["id_a", "id_b"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    timed(f"  b{batch_id} cands materialize", lambda: cands.count())
    sigs = mh.select("doc_id", "sh")
    prior_sigs = sig_store.current_for_keys(
        cands.select(F.col("id_a").alias("doc_id"))
    )
    if prior_sigs is not None:
        sigs = sigs.unionByName(prior_sigs.select("doc_id", "sh"))
    verified = (
        cands.join(
            sigs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            mh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .filter(F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6) >= threshold)
    )
    dropped = verified.select(F.col("id_b").alias("doc_id")).distinct()
    accepted = (
        batch.select("doc_id")
        .join(
            mh.select("doc_id", F.size("sh").alias("n_shingles")),
            "doc_id",
            "left",
        )
        .fillna(0, subset=["n_shingles"])
        .join(F.broadcast(dropped), "doc_id", "left_anti")
    )
    band_agg = batch_bands.groupBy("band_idx", "band_key").agg(
        F.collect_list("doc_id").alias("doc_ids")
    )
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def merges():
        with ThreadPoolExecutor(max_workers=3) as pool:
            jobs = [
                pool.submit(
                    inheritable_thread_target(out_store.merge),
                    accepted,
                    batch_id=batch_id,
                    insert_only=True,
                ),
                pool.submit(
                    inheritable_thread_target(band_store.merge),
                    band_agg,
                    combine=ND._union_doc_ids,
                    batch_id=batch_id,
                ),
                pool.submit(
                    inheritable_thread_target(sig_store.merge),
                    mh.select("doc_id", "sh"),
                    batch_id=batch_id,
                    insert_only=True,
                ),
            ]
            for j in jobs:
                j.result()

    timed(f"  b{batch_id} merges(3 overlapped)", merges)
    cands.unpersist()
    mh.unpersist()


for trial in range(2):
    print(f"--- trial {trial}", flush=True)
    workdir = f"/tmp/nd_probe_{os.getpid()}_{trial}"
    t_all = time.perf_counter()
    staging = timed(
        "stage_documents",
        lambda: stage_documents(
            spark, sf_dir, os.path.join(workdir, "staging_docs"), 4
        ),
    )
    band_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "band_index"),
        key_cols=["band_idx", "band_key"],
    )
    sig_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "signatures"), key_cols=["doc_id"]
    )
    out_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "accepted"), key_cols=["doc_id"]
    )

    def sink(batch, batch_id):
        t0 = time.perf_counter()
        instrumented_batch(band_store, sig_store, out_store, batch, batch_id)
        print(f"  b{batch_id} TOTAL: {time.perf_counter() - t0:.3f}s", flush=True)

    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    reader = reader.option("maxFilesPerTrigger", 2)
    reader = reader.option("latestFirst", "false")

    def run():
        q = (
            reader.parquet(staging)
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option(
                "checkpointLocation", os.path.join(workdir, "ckpt_near_dedup")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    timed("stream total", run)
    final = out_store.current()
    timed("final count", lambda: final.count())
    print(f"TRIAL TOTAL: {time.perf_counter() - t_all:.3f}s", flush=True)
    shutil.rmtree(workdir, ignore_errors=True)

spark.stop()
