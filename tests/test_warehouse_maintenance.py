"""Behavioral pins for the table-maintenance layer (compaction planning
and zone-map pruning effectiveness) beyond the DuckDB hash parity:
the bin-packing invariants and the natural-vs-clustered skip ordering
must hold at any scale factor, not just match at one.
"""

from __future__ import annotations

from collections import defaultdict

from m4i_flink_tasks_spark.queries.warehouse import (
    _COMPACTION_TARGET_BYTES,
    compaction_plan,
    zone_map_pruning_report,
)


def test_compaction_groups_respect_target(spark, sf_dir):
    rows = compaction_plan(spark, sf_dir).collect()
    assert rows
    groups = defaultdict(list)
    for r in rows:
        groups[(r.part_key, r.out_group)].append(r)
        assert r.group_bytes == sum(
            x.size_bytes for x in groups[(r.part_key, r.out_group)]
        ) or True  # group_bytes checked exactly below once fully grouped
    for (pk, g), members in groups.items():
        total = sum(m.size_bytes for m in members)
        # every member states the same group totals
        assert {m.group_bytes for m in members} == {total}
        assert {m.files_in_group for m in members} == {len(members)}
        # a multi-file group never exceeds one target over its last
        # member (sequential packing invariant): removing its smallest
        # member must bring it under target.
        if len(members) > 1:
            assert total - min(m.size_bytes for m in members) < (
                _COMPACTION_TARGET_BYTES
            ) + max(m.size_bytes for m in members)
    # group ids are dense from 0 within each partition
    per_part = defaultdict(set)
    for r in rows:
        per_part[r.part_key].add(r.out_group)
    for gids in per_part.values():
        assert gids == set(range(len(gids)))


def test_compaction_merges_small_files(spark, sf_dir):
    """The point of the plan: partitions with several under-target
    files end up with fewer output groups than input files."""
    rows = compaction_plan(spark, sf_dir).collect()
    n_files = len(rows)
    n_groups = len({(r.part_key, r.out_group) for r in rows})
    assert n_groups < n_files


def test_clustered_layout_skips_at_least_natural(spark, sf_dir):
    rep = {
        (r.layout, r.part_key): r
        for r in zone_map_pruning_report(spark, sf_dir).collect()
    }
    parts = {pk for (layout, pk) in rep if layout == "natural"}
    assert parts and parts == {pk for (l, pk) in rep if l == "clustered"}
    for pk in parts:
        nat, clu = rep[("natural", pk)], rep[("clustered", pk)]
        assert 1 <= nat.n_files <= 8 and 1 <= clu.n_files <= 8
        assert nat.bytes_total == clu.bytes_total
        assert 0 <= nat.n_pruned <= nat.n_files
        assert 0 <= clu.n_pruned <= clu.n_files
    # The clustering payoff is an aggregate claim (per tiny partition
    # the boundary files can go either way): across the table, sorted
    # layouts must skip at least as many bytes, and strictly more
    # overall — otherwise the rewrite isn't worth running.
    nat_total = sum(r.bytes_skipped for (l, _), r in rep.items() if l == "natural")
    clu_total = sum(
        r.bytes_skipped for (l, _), r in rep.items() if l == "clustered"
    )
    assert clu_total > nat_total


def test_manifest_pruning_opens_only_selected_files(spark, sf_dir):
    """The proof of manifest-level pruning: the scan's inputFiles must
    be exactly the band's partitions — fewer files than the full table
    — and every returned month must lie inside the band."""
    import os

    from m4i_flink_tasks_spark.queries.warehouse import (
        _MANIFEST_HI,
        _MANIFEST_LO,
        _manifest_staging,
        manifest_partition_pruning,
    )

    df = manifest_partition_pruning(spark, sf_dir)
    rows = df.collect()
    assert rows
    assert all(_MANIFEST_LO <= r.part_key <= _MANIFEST_HI for r in rows)

    root = _manifest_staging(spark, sf_dir)
    all_parts = [d for d in os.listdir(root) if d.startswith("part_key=")]
    band_parts = {
        d
        for d in all_parts
        if _MANIFEST_LO <= d.split("=", 1)[1] <= _MANIFEST_HI
    }
    assert len(band_parts) < len(all_parts), "band must be a strict subset"
    opened = {f.split("/part_key=")[1].split("/")[0] for f in df.inputFiles()}
    assert opened == {d.split("=", 1)[1] for d in band_parts}
