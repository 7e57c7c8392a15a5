"""Connected components over an edge DataFrame — the clustering step
that turns near-duplicate *pairs* into dedup *groups*.

A pair list (A~B, B~C) does not say which docs to keep; the survivor
set is one per connected component of the similarity graph. The
reference has nothing like this (SURVEY §2.6); for an LLM-data pipeline
it is the step between MinHash-LSH pair generation and actually
dropping duplicates.

Algorithm: iterative min-label propagation — every node repeatedly
adopts the smallest label among itself and its neighbors, to fixpoint.
Each round is one shuffle (edge-to-label join + min-aggregate), and the
round count is bounded by the longest min-label path, which for dedup
graphs (tiny, dense clusters) is 2-3. Lineage is truncated per round
with ``localCheckpoint`` so the plan does not grow with iterations —
the same driver-side fixpoint-loop pattern as the type-closure build
(functions/hierarchy.py), which is how Spark expresses small-diameter
graph iteration without a graph library. For web-scale graphs with
long paths the round count is O(log n) with the large-star/small-star
variant; dedup clusters never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it.

    Returns ``(node, component_id)``, one row per distinct node.
    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (silent truncation would mislabel components).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component_id", F.col("node"))
        .localCheckpoint()
    )
    from pyspark.sql import Observation

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("component_id").alias("neighbor_min"))
        )
        # The changed-row count rides the SAME job that materializes the
        # round's labels (Observation metrics are collected during the
        # eager localCheckpoint) — previously each round paid a second
        # action plus a labels-self-join shuffle just to decide
        # convergence (guide §1.2: don't compute things twice).
        obs = Observation()
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component_id").alias("_old"),
                F.least(
                    F.col("component_id"), F.coalesce("neighbor_min", "component_id")
                ).alias("component_id"),
            )
            .observe(
                obs,
                F.count(
                    F.when(F.col("component_id") != F.col("_old"), F.lit(1))
                ).alias("changed"),
            )
            .select("node", "component_id")
            .localCheckpoint()
        )
        labels = new_labels
        if obs.get["changed"] == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
