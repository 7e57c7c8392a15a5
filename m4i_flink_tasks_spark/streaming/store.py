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

    def _current_version(self) -> int:
        try:
            with open(self._pointer, encoding="utf-8") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return -1

    def _version_path(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:06d}")

    def _publish(self, df: DataFrame) -> None:
        version = self._current_version() + 1
        df.write.mode("overwrite").parquet(self._version_path(version))
        tmp = f"{self._pointer}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(str(version))
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
    ) -> None:
        """Upsert ``batch`` by key.

        Default semantics = ``MERGE … WHEN MATCHED THEN UPDATE SET *``:
        rows in ``batch`` replace same-key rows in the store. A custom
        ``combine(current, batch) -> new_state`` implements aggregating
        merges (e.g. additive counters + last-writer-wins columns).
        """
        cur = self.current()
        if cur is None:
            self._publish(batch)
            return
        if combine is not None:
            self._publish(combine(cur, batch))
            return
        kept = cur.join(
            F.broadcast(batch.select(*self.key_cols).distinct()),
            on=self.key_cols,
            how="left_anti",
        )
        self._publish(kept.unionByName(batch))

    def delete(self, keys: DataFrame) -> None:
        """``MERGE … WHEN MATCHED THEN DELETE`` — drop matching keys."""
        cur = self.current()
        if cur is None:
            return
        self._publish(
            cur.join(F.broadcast(keys.distinct()), on=self.key_cols, how="left_anti")
        )
