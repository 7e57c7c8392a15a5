"""Z-order (Morton) clustering for multi-column data skipping.

Single-column range partitioning prunes files on ONE predicate column;
a query filtering on a different column scans everything. Interleaving
the bits of two columns into one sort key (the Morton curve) makes
files cover LOCAL RECTANGLES of the 2-D key space, so min/max footer
stats prune files for predicates on EITHER column — the technique
behind Delta/Iceberg ``ZORDER BY``. This module implements the z-value
as a pure integer expression (works identically in DuckDB, so the
mapping itself is oracle-checkable), and the layout effect is pinned by
``tests/test_zorder_skipping.py`` against parquet footer statistics.

Scale notes: the z-value is a scan-speed projection; clustering is one
``repartitionByRange(z)`` write — the same one-time cost as any sorted
layout. Skipping multiplies at 100 TB: a file layout that turns a
full-scan predicate into a 1/16 file subset saves that fraction of I/O
before Spark schedules a single task.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def z_value(
    x_expr: str,
    y_expr: str,
    bits: int = DEFAULT_BITS,
    x_bits: int | None = None,
) -> Column:
    """Interleave the low bits of two non-negative int SQL expressions
    (column names or fragments): bit i of x lands at position 2i, bit i
    of y at 2i+1. Pure integer arithmetic (shifts/masks) — no UDF,
    reproducible cross-engine.

    ``x_bits`` (default ``bits``) widens x's budget beyond y's: the low
    ``bits`` bits of x interleave with y as usual and x's REMAINING
    high bits sit contiguously above the interleaved prefix. That keeps
    the mapping injective when x's domain outgrows ``2**bits`` (e.g.
    ``p_partkey`` passes 2^10 at every non-toy scale factor) while y —
    a genuinely bounded column like ``p_size`` ≤ 50 — spends no wasted
    bit positions. The curve stays a proper Morton order on the low
    rectangle and degrades to x-major ordering only across
    ``2**bits``-aligned x blocks, which is exactly the right locality
    trade for a skewed-domain pair."""
    return F.expr(_z_sql(x_expr, y_expr, bits, x_bits))


def _hi_bits_term(x_expr: str, bits: int, x_bits: int | None) -> str:
    """x's high bits (bits..x_bits) placed above the 2*bits-wide
    interleaved prefix; empty when the budgets are equal."""
    if x_bits is None or x_bits <= bits:
        return ""
    return f" + (((({x_expr}) >> {bits})) << (2 * {bits}))"


def _z_sql(
    x_expr: str,
    y_expr: str,
    bits: int = DEFAULT_BITS,
    x_bits: int | None = None,
) -> str:
    """The identical z-value as a SQL fragment (Spark and DuckDB share
    the shift/mask operators), used by both engines."""
    return (
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> "
        f"acc + (((({x_expr}) >> i) & 1) << (2 * i)) "
        f"+ (((({y_expr}) >> i) & 1) << (2 * i + 1)))"
        f"{_hi_bits_term(x_expr, bits, x_bits)}"
    )


def z_sql_duckdb(
    x_expr: str,
    y_expr: str,
    bits: int = DEFAULT_BITS,
    x_bits: int | None = None,
) -> str:
    """DuckDB spelling: list_reduce over the bit positions (DuckDB has
    no higher-order ``aggregate``; same arithmetic, same result)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, range(0, {bits})), "
        f"(acc, i) -> acc + (((({x_expr}) >> i) & 1) << (2 * i)) "
        f"+ (((({y_expr}) >> i) & 1) << (2 * i + 1)))"
        f"{_hi_bits_term(x_expr, bits, x_bits)}"
    )
