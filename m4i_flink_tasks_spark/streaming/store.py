"""Versioned parquet upsert store — the Delta-``MERGE INTO`` stand-in
used by the ``foreachBatch`` sinks (SURVEY §2.1 S4, §2.4 Q7).

The reference upserts into Elasticsearch with a deterministic doc id
(publish_state_job.py:77-84) and deletes App Search docs by id
(synchronize_app_search.py:200-202). Here the store is a directory of
immutable parquet versions plus a ``_CURRENT`` pointer file; every merge
writes a new version and atomically swaps the pointer, so readers never
see a half-written store and a re-run of the same micro-batch is
idempotent (last-writer-wins by key).

Scale posture: each merge rewrites the whole store, which is fine for
the micro-batch state sizes exercised here but O(store) at 100 TB. The
production swap-in is Delta Lake / Iceberg ``MERGE`` — identical logical
contract (keyed upsert + delete, snapshot isolation), with file-level
pruning so a merge touches only matching files. The pipeline code
depends only on ``merge``/``delete``/``current``, so that swap is a
one-class change.
"""

from __future__ import annotations

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
