"""Config-gated mid-query materialization (guide §5).

``localCheckpoint()`` is the cheapest lineage/plan cut in local mode,
but its blocks are **non-replicated executor state**: on a real cluster
with dynamic allocation or executor loss, losing a block fails the job
unrecoverably. Rather than pinning every fan-out materialization to
that fragile variant, call sites route through :func:`materialize` and
deployments pick the strategy per session:

``spark.m4i.materialize.strategy``
    - ``localCheckpoint`` (default): eager local checkpoint — right for
      local mode and static-allocation clusters where recomputing a
      lost mid-query block is acceptable.
    - ``persist``: ``MEMORY_AND_DISK`` persist, made eager with a
      ``count()`` so the timing/fan-out semantics match the default;
      recomputable on executor loss (lineage kept), still collapses the
      downstream physical plan to an ``InMemoryTableScan``.
    - ``checkpoint``: reliable checkpoint to
      ``sparkContext.setCheckpointDir`` storage — survives executor
      loss, costs one distributed write+read.

Every call is per-invocation and inside the timed region: nothing here
caches across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_CONF = "spark.m4i.materialize.strategy"


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer intermediate and cut its lineage,
    with the strategy chosen by ``spark.m4i.materialize.strategy``."""
    strategy = df.sparkSession.conf.get(_CONF, "localCheckpoint")
    if strategy == "localCheckpoint":
        return df.localCheckpoint()
    if strategy == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        out.count()
        return out
    if strategy == "checkpoint":
        return df.checkpoint()
    if strategy == "none":
        # Plan-dump/debug only: materialization disabled so
        # explain() shows the full pre-checkpoint plan end-to-end
        # (checkpointed queries otherwise explain as `Scan
        # ExistingRDD` tails, hiding the Exchange accounting).
        return df
    raise ValueError(
        f"unknown {_CONF}={strategy!r}; expected localCheckpoint | "
        "persist | checkpoint | none"
    )
