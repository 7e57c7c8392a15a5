"""Versioned parquet upsert store — the Delta-``MERGE INTO`` stand-in
used by the ``foreachBatch`` sinks (SURVEY §2.1 S4, §2.4 Q7).

The reference upserts into Elasticsearch with a deterministic doc id
(publish_state_job.py:77-84) and deletes App Search docs by id
(synchronize_app_search.py:200-202). Here the store is a directory of
immutable parquet versions plus a ``_CURRENT`` pointer file; every merge
writes a new version and atomically swaps the pointer, so readers never
see a half-written store and a re-run of the same micro-batch is
idempotent (last-writer-wins by key).

Scale posture: ``ParquetUpsertStore`` rewrites the whole store per
merge — O(store) per micro-batch, fine for small state, not at 100 TB.
``BucketedParquetUpsertStore`` below bounds merge cost by the TOUCHED
key buckets (hash-bucket partitioning + per-bucket version pointers),
which is the posture that survives state growth. The production
swap-in for either is Delta Lake / Iceberg ``MERGE`` — identical
logical contract (keyed upsert + delete, snapshot isolation), with
file-level pruning so a merge touches only matching files. The
pipeline code depends only on ``merge``/``delete``/``current``, so
that swap is a one-class change.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetUpsertStore:
    """Keyed upsert store over versioned parquet directories."""

    def __init__(
        self, spark: SparkSession, root: str, key_cols: Sequence[str]
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_cols = list(key_cols)
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping -------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def _pointer_state(self) -> tuple[int, int | None]:
        """(current version, last applied batch id or None)."""
        try:
            with open(self._pointer, encoding="utf-8") as fh:
                lines = fh.read().strip().splitlines()
        except FileNotFoundError:
            return -1, None
        version = int(lines[0])
        batch_id = int(lines[1]) if len(lines) > 1 else None
        return version, batch_id

    def _current_version(self) -> int:
        return self._pointer_state()[0]

    def last_batch_id(self) -> int | None:
        """Streaming batch id recorded with the current version, if any."""
        return self._pointer_state()[1]

    def _version_path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def _publish(self, df: DataFrame, batch_id: int | None = None) -> None:
        # The pointer swap is the commit point; writing the batch id in
        # the same atomic rename means "which batch is applied" can never
        # disagree with "which version is current" — the transaction-log
        # half of the standard foreachBatch exactly-once recipe (Delta
        # records txnAppId/txnVersion the same way).
        version = self._current_version() + 1
        df.write.mode("overwrite").parquet(self._version_path(version))
        tmp = f"{self._pointer}.tmp.{os.getpid()}"
        content = str(version) if batch_id is None else f"{version}\n{batch_id}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(content)
        os.replace(tmp, self._pointer)

    # -- public API ----------------------------------------------------
    def current(self) -> DataFrame | None:
        """Snapshot of the store, or None before the first merge."""
        version = self._current_version()
        if version < 0:
            return None
        return self.spark.read.parquet(self._version_path(version))

    def merge(
        self,
        batch: DataFrame,
        combine: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
        batch_id: int | None = None,
    ) -> None:
        """Upsert ``batch`` by key.

        Default semantics = ``MERGE … WHEN MATCHED THEN UPDATE SET *``:
        rows in ``batch`` replace same-key rows in the store. A custom
        ``combine(current, batch) -> new_state`` implements aggregating
        merges (e.g. additive counters + last-writer-wins columns).

        ``batch_id``: pass the ``foreachBatch`` batch id for aggregating
        combines. Last-writer-wins merges are naturally idempotent, but
        an additive combine applied twice double-counts — and a crash
        after the pointer swap but before the streaming checkpoint
        commits makes Spark replay the batch. Recording the id with the
        version and skipping ``batch_id <= last_batch_id()`` makes the
        replay a no-op (effectively-once).
        """
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return
        cur = self.current()
        if cur is None:
            self._publish(batch, batch_id)
            return
        if combine is not None:
            self._publish(combine(cur, batch), batch_id)
            return
        kept = cur.join(
            F.broadcast(batch.select(*self.key_cols).distinct()),
            on=self.key_cols,
            how="left_anti",
        )
        self._publish(kept.unionByName(batch), batch_id)

    def delete(self, keys: DataFrame) -> None:
        """``MERGE … WHEN MATCHED THEN DELETE`` — drop matching keys."""
        cur = self.current()
        if cur is None:
            return
        self._publish(
            cur.join(F.broadcast(keys.distinct()), on=self.key_cols, how="left_anti")
        )


class BucketedParquetUpsertStore:
    """Hash-bucketed variant of :class:`ParquetUpsertStore` whose merge
    cost is bounded by the TOUCHED buckets, not the store size.

    ``ParquetUpsertStore`` rewrites the whole store every merge —
    honest about being O(store) per micro-batch, which does not survive
    100x state growth. Here rows are hash-partitioned by key into
    ``n_buckets`` buckets (``xxhash64 % n_buckets``, the same layout a
    Delta/Iceberg table would get from bucket partitioning); a merge

    - computes the batch's touched buckets (a <= n_buckets-row collect),
    - rewrites ONLY those buckets (one write job, ``partitionBy``),
    - commits by atomically replacing a JSON pointer that maps every
      bucket to the version directory holding its current data.

    Untouched buckets keep pointing at their old version directories —
    zero bytes rewritten for them. The pointer also records the last
    applied foreachBatch batch id (same effectively-once contract as
    the base store). The production swap-in remains Delta/Iceberg
    ``MERGE`` with file-level pruning; this class demonstrates the
    bounded-merge contract with plain parquet.

    A custom ``combine(current, batch)`` receives the current rows of
    the touched buckets only; it must be key-local (every combine in
    this repo is a per-key join/aggregate, which hash bucketing
    co-locates by construction).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_cols: Sequence[str],
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.root = root
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- pointer bookkeeping -------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def _state(self) -> dict | None:
        try:
            with open(self._pointer, encoding="utf-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def last_batch_id(self) -> int | None:
        state = self._state()
        return None if state is None else state.get("batch_id")

    def _version_path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def _bucket_path(self, version: int, bucket: int) -> str:
        return os.path.join(self._version_path(version), f"_bucket={bucket}")

    def _bucket_col(self):
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.key_cols]),
            F.lit(self.n_buckets),
        ).cast("int")

    def _commit(
        self, buckets: dict[str, int], version: int, batch_id: int | None
    ) -> None:
        state = {"version": version, "batch_id": batch_id, "buckets": buckets}
        tmp = f"{self._pointer}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh)
        os.replace(tmp, self._pointer)

    # -- public API ----------------------------------------------------
    def current(self) -> DataFrame | None:
        """Snapshot of the store, or None before the first merge."""
        state = self._state()
        if state is None:
            return None
        paths = [
            self._bucket_path(v, int(b)) for b, v in state["buckets"].items()
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _touched_current(self, state: dict, touched: list[int]) -> DataFrame | None:
        paths = [
            self._bucket_path(state["buckets"][str(b)], b)
            for b in touched
            if str(b) in state["buckets"]
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _write_buckets(self, df: DataFrame, version: int) -> dict[str, int]:
        """Write df partitioned by bucket under the version dir; return
        the bucket -> version entries for buckets that got data."""
        (
            df.withColumn("_bucket", self._bucket_col())
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(self._version_path(version))
        )
        written = {}
        vpath = self._version_path(version)
        for name in os.listdir(vpath):
            if name.startswith("_bucket="):
                written[name.split("=", 1)[1]] = version
        return written

    def merge(
        self,
        batch: DataFrame,
        combine: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
        batch_id: int | None = None,
    ) -> None:
        """Keyed upsert rewriting only buckets containing batch keys."""
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return
        state = self._state()
        if state is None:
            buckets = self._write_buckets(batch, 0)
            self._commit(buckets, 0, batch_id)
            return
        touched = sorted(
            r["_bucket"]
            for r in batch.select(self._bucket_col().alias("_bucket"))
            .distinct()
            .collect()
        )
        cur = self._touched_current(state, touched)
        if cur is None:
            new_data = batch
        elif combine is not None:
            new_data = combine(cur, batch)
        else:
            kept = cur.join(
                F.broadcast(batch.select(*self.key_cols).distinct()),
                on=self.key_cols,
                how="left_anti",
            )
            new_data = kept.unionByName(batch)
        version = state["version"] + 1
        written = self._write_buckets(new_data, version)
        buckets = dict(state["buckets"])
        for b in touched:
            buckets.pop(str(b), None)  # emptied buckets leave the map
        buckets.update(written)
        self._commit(buckets, version, batch_id)

    def delete(self, keys: DataFrame, batch_id: int | None = None) -> None:
        """Drop matching keys, rewriting only their buckets."""
        if batch_id is not None:
            last = self.last_batch_id()
            if last is not None and batch_id <= last:
                return
        state = self._state()
        if state is None:
            return
        touched = sorted(
            r["_bucket"]
            for r in keys.select(self._bucket_col().alias("_bucket"))
            .distinct()
            .collect()
        )
        cur = self._touched_current(state, touched)
        if cur is None:
            return
        remaining = cur.join(
            F.broadcast(keys.distinct()), on=self.key_cols, how="left_anti"
        )
        version = state["version"] + 1
        written = self._write_buckets(remaining, version)
        buckets = dict(state["buckets"])
        for b in touched:
            buckets.pop(str(b), None)
        buckets.update(written)
        self._commit(buckets, version, batch_id)
