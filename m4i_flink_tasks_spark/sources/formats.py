"""Multi-format batch ingest/egress — parquet, ORC, JSON-lines, CSV
behind one interface.

The engine's native storage is parquet (columnar, predicate pushdown,
footer stats — see ``tables.py``), but a real deployment ingests
whatever lands: ORC from legacy Hive warehouses, JSON-lines from
logging pipelines, CSV from exports. ``read_any`` routes on extension
(or explicit ``fmt``) to the right ``DataFrameReader`` with the options
that make the formats round-trip losslessly where the format allows:

- **orc**: full fidelity (nested types, timestamps, binary) AND real
  predicate pushdown + column pruning — the only non-parquet format
  here that keeps the scan-layer optimizations, so it is the supported
  interchange format for big inputs.
- **json** (lines): schema must be supplied or inferred (inference is
  a full extra pass — always pass ``schema`` at scale); timestamps
  round-trip via an explicit ISO-8601 ``timestampFormat`` with
  microsecond precision, pinned identically on write and read.
- **csv**: flat columns only (arrays/structs/binary are not
  representable); header row written, schema required on read (header
  names + supplied types). Timestamps use the same pinned format as
  JSON.

Scale note: CSV/JSON scans cannot push predicates into the reader —
Catalyst still prunes columns (csv fast-path skips unneeded fields)
but every row is parsed. The intended 100 TB pattern is: land
CSV/JSON once → rewrite to parquet (``write_any(df, p, "parquet")``)
→ query parquet; these readers exist for the landing step, not the
query path.

No reference analogue (the reference reads Kafka/Elasticsearch only,
SURVEY §2.1); engine-completeness scope.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Microsecond-precision ISO-8601, used on BOTH write and read so text
# formats round-trip timestamps bit-for-bit (the default drops
# sub-second precision on CSV write).
TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_EXTENSIONS = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
    ".csv": "csv",
}

FORMATS = ("parquet", "orc", "json", "csv")


def sniff_format(path: str) -> str:
    """Format from the file/dir extension; parquet when unrecognized
    (the native default)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    return _EXTENSIONS.get(ext, "parquet")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read ``path`` in ``fmt`` (sniffed from the extension when not
    given). ``schema`` is required for CSV and strongly recommended for
    JSON (inference costs a full extra pass and can widen types)."""
    fmt = fmt or sniff_format(path)
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "orc":
        return reader.orc(path)
    if fmt == "json":
        return reader.option("timestampFormat", TIMESTAMP_FORMAT).json(path)
    if schema is None:
        raise ValueError(
            "csv requires an explicit schema (header gives names, not types)"
        )
    return (
        reader.option("header", "true")
        .option("timestampFormat", TIMESTAMP_FORMAT)
        .csv(path)
    )


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ``fmt`` with options matching ``read_any`` so
    the pair round-trips. CSV refuses nested/binary columns loudly
    instead of silently corrupting them."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    elif fmt == "json":
        writer.option("timestampFormat", TIMESTAMP_FORMAT).json(path)
    else:
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.dataType.simpleString()[:6] in ("array<", "struct", "map<st")
            or f.dataType.simpleString() == "binary"
        ]
        if bad:
            raise ValueError(
                f"csv cannot represent nested/binary columns: {bad}; "
                "use orc or parquet"
            )
        (
            writer.option("header", "true")
            .option("timestampFormat", TIMESTAMP_FORMAT)
            .csv(path)
        )
