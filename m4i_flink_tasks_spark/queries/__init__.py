"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet views). ``all_queries()`` / ``all_oracles()`` merge them for
``__spark_entry__``. A query without an oracle entry gets the driver's
weaker rows-only check (documented per query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    cdc,
    doc_lifecycle,
    doc_maintenance,
    extended_relational,
    graph,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    llm_text,
    pipelines,
    relational,
    state_store,
    streaming_like,
)


_MODULES = (
    relational,
    extended_relational,
    cdc,
    state_store,
    graph,
    doc_maintenance,
    doc_lifecycle,
    streaming_like,
    pipelines,
    llm_dedup,
    llm_similarity,
    llm_text,
    llm_multimodal,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged
