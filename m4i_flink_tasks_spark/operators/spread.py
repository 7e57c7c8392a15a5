"""Conditional minimum-parallelism guard for CPU-dense stages.

A compact parquet input (one landing file, a couple of row groups)
plans as 1-2 splits no matter how many cores the cluster has, so any
stage doing heavy PER-ROW work directly over the scan — an Arrow
Python kernel or an expression-native HOF pipeline (tokenize /
lang-ID / n-gram transforms) — serializes on those few tasks. The r5
sf1 rehearsal measured the hazard twice: `multimodal_container_demux`
at 6.6x for the Python form and `language_confusion_matrix` at 5.2x
for the pure-JVM form (50k docs of stopword-argmax work on 2 of 32
cores; repartitioning cut it 5.5x).

`spread_for_compute` repartitions only when the input has fewer
partitions than `defaultParallelism` — a no-op on a well-laid-out
table (thousands of files), one narrow shuffle when the input is
compact, which is exactly when that shuffle is cheap. Streaming
relations pass through (micro-batch sizing belongs to the trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, *keys: str) -> DataFrame:
    """Ensure at least `defaultParallelism` partitions before a
    CPU-dense stage. With `keys`, repartition by hash on those columns
    (stable co-location for downstream keyed work); without, use
    round-robin (cheapest even spread)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *keys) if keys else df.repartition(target)
    return df
