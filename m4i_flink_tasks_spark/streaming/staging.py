"""Shared staged-topic writer for the streaming state twins.

Every stream twin replays a bounded, time-ordered parquet "topic"
(the Kafka stand-in — see ``sources.py``): write the projection as
``n_files`` range-partitioned files, then space the file mtimes one
second apart so ``maxFilesPerTrigger`` replays them in a deterministic
order. That block had been copy-pasted per module; new twins use this
one definition (the older modules keep their verbatim copies — each is
pinned by its own restart tests — and migrate here opportunistically).
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame


def stage_ordered_topic(
    df: DataFrame, staging_dir: str, n_files: int, order_col: str
) -> str:
    """Idempotently write ``df`` as an ``n_files``-file topic ordered by
    ``order_col`` (the column is used for range partitioning and then
    dropped). Returns ``staging_dir``."""
    if os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
        return staging_dir
    (
        df.repartitionByRange(n_files, order_col)
        .drop(order_col)
        .write.mode("overwrite")
        .parquet(staging_dir)
    )
    parts = sorted(glob.glob(os.path.join(staging_dir, "part-*.parquet")))
    t0 = time.time() - len(parts) - 1
    for i, path in enumerate(parts):
        os.utime(path, (t0 + i, t0 + i))
    return staging_dir
