"""Local replica of the driver's DuckDB correctness gate.

Runs a Spark query and its DuckDB oracle on the same sf dir, normalizes
both result sets (column order by name, row order by all columns, float
rounding), and diffs them. Used by test_oracle_parity.py so mismatches
surface locally before the driver's CORRECTNESS_r{N}.json does.
"""

from __future__ import annotations

import math
from datetime import datetime

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _norm_cell(v):
    # The driver's canonicalizer is pandas-based: list/dict cells raise
    # ("unhashable type") and int64 vs float64 values hash differently.
    # Mirror both behaviors so mismatches surface locally first.
    if isinstance(v, (list, dict, set)):
        raise TypeError(
            "array/map-typed result column: driver's canonicalizer cannot "
            "hash this — serialize with to_json/array_join at the query "
            f"boundary (got {v!r})"
        )
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        # defensive: collapse sub-round-off noise
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return ("t", v.isoformat())
    return ("s", v) if isinstance(v, str) else ("o", v)


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def canonical_hash(df) -> str:
    """The driver's pandas-based canonicalization: columns sorted by
    name, float columns rounded, rows sorted, CSV-serialized, hashed.
    CRITICALLY this is dtype-sensitive — an int64 column on one side
    and float64 on the other (e.g. DuckDB HUGEINT sums coming back as
    float64) hash differently even with equal values, so oracles must
    cast aggregates to the dtype Spark produces."""
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f")
    return hashlib.sha256(payload.encode()).hexdigest()


def compare(spark, query_fn, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Driver-faithful comparison: BOTH sides go through pandas
    (``toPandas`` / ``fetchdf``) and the same canonical hash, so dtype
    drift surfaces here before a CORRECTNESS_r{N}.json row does. The
    cell-level ``normalize`` diff runs only after a hash mismatch, to
    say WHERE the results differ (value vs dtype-only)."""
    sdf_df = query_fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf_df.columns]
    spd = sdf_df.toPandas()

    con = duck_connection(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0].lower() for d in res.description]
    dpd = res.fetchdf()
    con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(spd) != len(dpd):
        return False, f"row count mismatch: spark={len(spd)} duck={len(dpd)}"

    if canonical_hash(spd) == canonical_hash(dpd):
        return True, "ok"

    # Hash mismatch — localize it: dtype-only, or a real value diff?
    sn = normalize(s_cols, [tuple(r) for r in spd.itertuples(index=False)])
    dn = normalize(d_cols, [tuple(r) for r in dpd.itertuples(index=False)])
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, (
                f"first diff at normalized row {i}:\n  spark={a}\n  duck ={b}"
            )
    return False, (
        "driver-canonical hash mismatch with no cell-level diff — "
        f"dtype drift: spark={spd.dtypes.to_dict()} duck={dpd.dtypes.to_dict()}"
    )
