"""Unit tests for operators/components.py (min-label propagation CC)."""

from __future__ import annotations

import pytest

from m4i_flink_tasks_spark.operators.components import connected_components


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["component_id"] for r in df.collect()}


def test_chain_and_island_components(spark):
    # chain 1-2-3-4 plus island 10-11; min id labels each component
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_min_label_crosses_long_path(spark):
    # the smallest id sits at one end of a 6-hop path: propagation must
    # carry it the full diameter, not just one hop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "src bigint, dst bigint"
    )
    got = _labels(connected_components(edges))
    assert set(got.values()) == {1}


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)


def test_random_graphs_match_union_find(spark):
    """Randomized cross-check: min-label propagation must agree with a
    driver-side union-find on arbitrary small graphs (multiple
    components, cycles, self-loops, duplicate edges)."""
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(2, 40)
        edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(1, 60))
        ]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min member id of each component
        members: dict[int, list[int]] = {}
        for x in set(v for e in edges for v in e):
            members.setdefault(find(x), []).append(x)
        expected = {
            x: min(group) for group in members.values() for x in group
        }

        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = _labels(connected_components(df))
        assert got == expected, f"trial {trial} (n={n}, edges={edges})"
