"""Streaming numeric-profile maintenance: the exact moment vector
(count, sums, squares, cross-products) as single-row additive state.

Companion to ``queries/profiling.py`` ``numeric_correlation_matrix``:
every moment the Pearson readout needs is a sum of per-row integer
terms, so the whole statistic vector is one addition-monoid fold —
the canonical "aggregate state" of online feature statistics. The
state is ONE row (15 decimal columns) regardless of stream length,
replay-fenced by batch_id; the shared ``corr_from_moments`` readout
then yields the identical correlation matrix the batch query
computes, so the batch oracle oracles the stream.

No reference analogue (the reference maintains no aggregation state —
SURVEY §2.6); north-star streaming-capability scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .staging import stage_ordered_topic
from .store import BucketedParquetUpsertStore

_DEC = "decimal(38,0)"
MOMENT_STREAM_SCHEMA = (
    "quantity long, price_cents long, discount_bp long, tax_bp long"
)


def stage_numeric_rows(
    spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 4
) -> str:
    """Stage lineitem's integer-scaled numeric columns, ``n_files``
    orderkey-ordered parquet files (idempotent immutable-topic model)."""
    li = load_table(spark, sf_dir, "lineitem")
    return stage_ordered_topic(
        li.select(
            "l_orderkey",
            F.col("l_quantity").cast("long").alias("quantity"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("price_cents"),
            F.round(F.col("l_discount") * 10000)
            .cast("long")
            .alias("discount_bp"),
            F.round(F.col("l_tax") * 10000).cast("long").alias("tax_bp"),
        ),
        staging_dir,
        n_files,
        "l_orderkey",
    )


def _batch_moments(batch: DataFrame) -> DataFrame:
    from ..queries.profiling import _CORR_NAMES, moment_aggs

    proj = batch.select(
        *[F.col(n).cast(_DEC).alias(n) for n in _CORR_NAMES]
    )
    return proj.agg(*moment_aggs()).withColumn("k", F.lit(1))


def _add_moments(cur: DataFrame, batch: DataFrame) -> DataFrame:
    value_cols = [c for c in cur.columns if c != "k"]
    zero = F.lit(0).cast(_DEC)
    joined = cur.select(
        "k", *[F.col(c).alias(f"_o_{c}") for c in value_cols]
    ).join(
        batch.select("k", *[F.col(c).alias(f"_n_{c}") for c in value_cols]),
        "k",
        "full_outer",
    )
    return joined.select(
        "k",
        *[
            (
                F.coalesce(f"_o_{c}", zero) + F.coalesce(f"_n_{c}", zero)
            ).alias(c)
            for c in value_cols
        ],
    )


def run_stream_numeric_profile(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    from ..queries.profiling import corr_from_moments

    staging = stage_numeric_rows(
        spark, sf_dir, os.path.join(workdir, "staging_numeric"), n_files
    )
    store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "moments_state"),
        key_cols=["k"],
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        store.merge(
            _batch_moments(batch), combine=_add_moments, batch_id=batch_id
        )

    reader = spark.readStream.schema(MOMENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        reader = reader.option("latestFirst", "false")
    query = (
        reader.parquet(staging)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_moments"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    state = store.current()
    assert state is not None
    return corr_from_moments(state.drop("k"))
