"""Streaming Fellegi-Sunter linkage serving — new records probe a
maintained block index for candidates and are scored on arrival, the
incremental form of ``queries/entity_resolution.py``.

This is the ER serving loop a master-data system runs: a new customer
record arrives, its block keys look up previously-seen records
sharing a block, the FS agreement vector is computed against exactly
those candidates, and the scored pair lands in the linkage store.
State, all in bucketed log-structured stores (O(touched buckets) per
batch, never O(store)) — the same layout the streaming near-dedup and
BM25-index twins proved:

- ``block_index`` keyed ``(pass_idx, blk, c_nationkey)`` -> array of
  seen custkeys, one row per 2-of-3-parts block key (the module's
  6-digit interleaved keys + the nation blocking conjunct). New batch
  keys read ONLY their buckets (``current_for_keys``); the merge
  unions custkey lists per key (an aggregating combine).
- ``attrs`` keyed ``c_custkey`` -> the scored fields (name, segment,
  balance bucket), insert-only. Read bucket-pruned for exactly the
  prior records that became candidates (the scoring working set).
- ``pairs`` keyed ``(src, dst)`` -> the agreement vector, insert-only
  — the scored-candidate output relation.

A pair is discovered exactly once — when its LATER record arrives
(the earlier one is in the block index) or, for same-batch pairs, by
the in-batch self-join — so the union over batches is exactly the
batch candidate set and the readout (the shared
``fs_band_report`` kernel over the pairs store) equals the batch
answer verbatim: the batch oracle oracles the stream. Records arrive
whole and exactly once (staged-topic replay + batch-id-fenced
merges), so every store is batch-split- and restart-invariant.

Scale: per batch the wide operations are the in-batch block self-join
and the candidate scoring join, both proportional to the batch and
its candidate set (bounded blocks by the interleaved-entropy
argument); state reads are pruned to touched buckets. At 100 TB the
stores are Delta tables with the same keyed contracts and the block
index is the posting-list layout an MDM system shards by block key.

No reference analogue (the reference has no ER surface); north-star
streaming-capability scope, the r9 verdict's "next" #5.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .staging import stage_ordered_topic
from .store import BucketedParquetUpsertStore

CUST_STREAM_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_mktsegment string, c_acctbal double"
)


def stage_customers(
    spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 4
) -> str:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    # keep the order column: it is part of the record
    return stage_ordered_topic(
        cust.withColumn("_ord", F.col("c_custkey")),
        staging_dir,
        n_files,
        "_ord",
    )


def _union_custkeys(
    key_cols: list[str],
) -> "callable":
    """Aggregating combine for a block index: per block key, the union
    of previously-seen and newly-arrived custkey lists."""
    empty = F.array().cast("array<bigint>")

    def combine(cur: DataFrame, batch: DataFrame) -> DataFrame:
        return (
            cur.withColumnRenamed("custkeys", "_old")
            .join(
                batch.withColumnRenamed("custkeys", "_new"),
                key_cols,
                "full_outer",
            )
            .select(
                *key_cols,
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_old"), empty),
                        F.coalesce(F.col("_new"), empty),
                    )
                ).alias("custkeys"),
            )
        )

    return combine


def _batch_side(batch: DataFrame) -> DataFrame:
    """The scored-field projection (the batch `_fs_candidates` side)."""
    return batch.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        (
            (F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(100_000))
            .cast("long")
        ).alias("bb"),
    )


def link_batch(
    block_store: BucketedParquetUpsertStore,
    attrs_store: BucketedParquetUpsertStore,
    pairs_store: BucketedParquetUpsertStore,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """Process one micro-batch: find every candidate pair joining a
    new record to (a) all records of earlier batches sharing a block
    key and (b) other records of this batch, score the FS agreement
    vector, and fold the batch into the block/attribute state."""
    from ..queries.entity_resolution import (
        _FS_PART_PAIRS,
        _LEV_MAX,
        _interleaved_key,
    )

    side = _batch_side(batch)
    batch_keys = side.select(
        "c_custkey",
        "c_nationkey",
        F.posexplode(
            F.array(
                *[
                    _interleaved_key("c_name", pp)
                    for pp in _FS_PART_PAIRS
                ]
            )
        ).alias("pass_idx", "blk"),
    )

    # Prior candidates: bucket-pruned read of only the block-index
    # buckets this batch's keys touch.
    prior = block_store.current_for_keys(batch_keys)
    cand_prior = None
    if prior is not None:
        cand_prior = batch_keys.join(
            prior, ["pass_idx", "blk", "c_nationkey"]
        ).select(
            F.explode("custkeys").alias("id_a"),
            F.col("c_custkey").alias("id_b"),
        )
    left = batch_keys.alias("l")
    right = batch_keys.alias("r")
    cand_batch = left.join(
        right,
        (F.col("l.pass_idx") == F.col("r.pass_idx"))
        & (F.col("l.blk") == F.col("r.blk"))
        & (F.col("l.c_nationkey") == F.col("r.c_nationkey"))
        & (F.col("l.c_custkey") < F.col("r.c_custkey")),
    ).select(
        F.col("l.c_custkey").alias("id_a"),
        F.col("r.c_custkey").alias("id_b"),
    )
    cands = (
        cand_batch
        if cand_prior is None
        else cand_prior.unionByName(cand_batch)
    ).select(
        F.least("id_a", "id_b").alias("src"),
        F.greatest("id_a", "id_b").alias("dst"),
    ).filter(F.col("src") < F.col("dst")).dropDuplicates(["src", "dst"])

    # Scoring attributes: each pair has at least one side in this
    # batch, but after least/greatest normalization EITHER side may be
    # the prior record (a prior custkey can exceed an arriving one if
    # the topic is not key-ordered), so the bucket-pruned store read
    # covers both columns.
    attrs = side
    prior_attrs = attrs_store.current_for_keys(
        cands.select(F.col("src").alias("c_custkey")).unionByName(
            cands.select(F.col("dst").alias("c_custkey"))
        )
    )
    if prior_attrs is not None:
        attrs = attrs.unionByName(
            prior_attrs.select(
                "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "bb"
            )
        )
    a = attrs.alias("a")
    b = attrs.alias("b")
    scored = (
        cands.join(a, F.col("src") == F.col("a.c_custkey"))
        .join(b, F.col("dst") == F.col("b.c_custkey"))
        .select(
            "src",
            "dst",
            (
                F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
                <= _LEV_MAX
            ).alias("ag_name"),
            (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias(
                "ag_segment"
            ),
            (F.col("a.bb") == F.col("b.bb")).alias("ag_balance"),
        )
    )
    pairs_store.merge(scored, batch_id=batch_id, insert_only=True)

    block_agg = batch_keys.groupBy("pass_idx", "blk", "c_nationkey").agg(
        F.collect_list("c_custkey").alias("custkeys")
    )
    block_store.merge(
        block_agg,
        combine=_union_custkeys(["pass_idx", "blk", "c_nationkey"]),
        batch_id=batch_id,
    )
    attrs_store.merge(side, batch_id=batch_id, insert_only=True)


def _run_linkage_stream(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """Replay the bounded customer stream through the three-store
    linkage sink; return the maintained scored-pair relation."""
    staging = stage_customers(
        spark, sf_dir, os.path.join(workdir, "staging_cust"), n_files
    )
    block_store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "block_index"),
        key_cols=["pass_idx", "blk", "c_nationkey"],
    )
    attrs_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "attrs"), key_cols=["c_custkey"]
    )
    pairs_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "pairs"), key_cols=["src", "dst"]
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        link_batch(block_store, attrs_store, pairs_store, batch, batch_id)

    reader = spark.readStream.schema(CUST_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        reader = reader.option("latestFirst", "false")
    query = (
        reader.parquet(staging)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option(
            "checkpointLocation", os.path.join(workdir, "ckpt_fs_linkage")
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    pairs = pairs_store.current()
    if pairs is None:
        pairs = spark.createDataFrame(
            [],
            "src long, dst long, ag_name boolean, ag_segment boolean, "
            "ag_balance boolean",
        )
    return pairs.select("src", "dst", "ag_name", "ag_segment", "ag_balance")


def run_stream_fs_linkage(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Replay the bounded customer stream; return the shared FS band
    report over the maintained scored-pair store."""
    from ..queries.entity_resolution import fs_band_report

    return fs_band_report(
        _run_linkage_stream(
            spark, sf_dir, workdir, n_files, max_files_per_trigger
        )
    )


def match_batch(
    block_store: BucketedParquetUpsertStore,
    names_store: BucketedParquetUpsertStore,
    pairs_store: BucketedParquetUpsertStore,
    batch: DataFrame,
    batch_id: int,
) -> None:
    """The DETERMINISTIC-rule sibling of `link_batch`: candidates from
    the two interleaved-halves block passes (nation + segment as
    blocking conjuncts, the batch `_candidate_pairs` scheme), VERIFIED
    lev<=1 pairs kept — the streaming form of the
    `entity_match_clusters` match graph."""
    from ..queries.entity_resolution import (
        _EVEN_POS,
        _LEV_MAX,
        _ODD_POS,
        _interleaved_key,
    )

    side = batch.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    batch_keys = side.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.posexplode(
            F.array(
                _interleaved_key("c_name", _ODD_POS),
                _interleaved_key("c_name", _EVEN_POS),
            )
        ).alias("pass_idx", "blk"),
    )
    key_cols = ["pass_idx", "blk", "c_nationkey", "c_mktsegment"]

    prior = block_store.current_for_keys(batch_keys)
    cand_prior = None
    if prior is not None:
        cand_prior = batch_keys.join(prior, key_cols).select(
            F.explode("custkeys").alias("id_a"),
            F.col("c_custkey").alias("id_b"),
        )
    left = batch_keys.alias("l")
    right = batch_keys.alias("r")
    cand_batch = left.join(
        right,
        (F.col("l.pass_idx") == F.col("r.pass_idx"))
        & (F.col("l.blk") == F.col("r.blk"))
        & (F.col("l.c_nationkey") == F.col("r.c_nationkey"))
        & (F.col("l.c_mktsegment") == F.col("r.c_mktsegment"))
        & (F.col("l.c_custkey") < F.col("r.c_custkey")),
    ).select(
        F.col("l.c_custkey").alias("id_a"),
        F.col("r.c_custkey").alias("id_b"),
    )
    cands = (
        cand_batch
        if cand_prior is None
        else cand_prior.unionByName(cand_batch)
    ).select(
        F.least("id_a", "id_b").alias("src"),
        F.greatest("id_a", "id_b").alias("dst"),
    ).filter(F.col("src") < F.col("dst")).dropDuplicates(["src", "dst"])

    # (same both-sides read as link_batch: either side of a normalized
    # pair may be the prior record on an unordered topic)
    names = side.select("c_custkey", "c_name")
    prior_names = names_store.current_for_keys(
        cands.select(F.col("src").alias("c_custkey")).unionByName(
            cands.select(F.col("dst").alias("c_custkey"))
        )
    )
    if prior_names is not None:
        names = names.unionByName(prior_names.select("c_custkey", "c_name"))
    a = names.alias("a")
    b = names.alias("b")
    matched = (
        cands.join(a, F.col("src") == F.col("a.c_custkey"))
        .join(b, F.col("dst") == F.col("b.c_custkey"))
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= _LEV_MAX
        )
        .select("src", "dst")
    )
    pairs_store.merge(matched, batch_id=batch_id, insert_only=True)

    block_agg = batch_keys.groupBy(*key_cols).agg(
        F.collect_list("c_custkey").alias("custkeys")
    )
    block_store.merge(
        block_agg, combine=_union_custkeys(key_cols), batch_id=batch_id
    )
    names_store.merge(
        side.select("c_custkey", "c_name"),
        batch_id=batch_id,
        insert_only=True,
    )


def run_stream_entity_clusters(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming twin of ``entity_match_clusters``: the verified
    match-pair graph maintained incrementally (each pair discovered
    exactly once, when its later record arrives), clustered at readout
    by the shared ``cluster_report`` kernel (connected components +
    largest-clusters rollup) — the batch oracle oracles the stream."""
    from ..queries.entity_resolution import cluster_report

    staging = stage_customers(
        spark, sf_dir, os.path.join(workdir, "staging_cust"), n_files
    )
    block_store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "block_index"),
        key_cols=["pass_idx", "blk", "c_nationkey", "c_mktsegment"],
    )
    names_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "names"), key_cols=["c_custkey"]
    )
    pairs_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "pairs"), key_cols=["src", "dst"]
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        match_batch(block_store, names_store, pairs_store, batch, batch_id)

    reader = spark.readStream.schema(CUST_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        reader = reader.option("latestFirst", "false")
    query = (
        reader.parquet(staging)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option(
            "checkpointLocation", os.path.join(workdir, "ckpt_er_clusters")
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    pairs = pairs_store.current()
    if pairs is None:
        pairs = spark.createDataFrame([], "src long, dst long")
    return cluster_report(pairs.select("src", "dst"))


def run_stream_fs_em(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming EM refresh: the same maintained scored-pair store,
    read out through the shared 8-cell histogram + fixed-iteration
    integer EM (``queries/entity_resolution.fs_em_report``) — the
    parameter-estimation loop an MDM deployment re-runs as records
    accumulate. The pair relation equals the batch candidate set
    (module docstring), so the batch EM oracle oracles the stream."""
    from ..queries.entity_resolution import _pattern_counts, fs_em_report

    pairs = _run_linkage_stream(
        spark, sf_dir, workdir, n_files, max_files_per_trigger
    )
    return fs_em_report(spark, _pattern_counts(pairs))
