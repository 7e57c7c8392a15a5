"""LocalRelation construction for KB-sized frozen frames.

``spark.createDataFrame(list_of_rows, schema)`` plans as a ``LogicalRDD``
parallelized over ``defaultParallelism`` slices, so every downstream
stage that scans the tiny frame schedules a full width of (mostly
empty) tasks — on local[32] that is 32 tasks per stage for a
32-row centroid table, and the frozen-index serving path of
``ivfpq_adc_topk`` crosses such frames several times per query
(measured: ~0.4-0.5 s of pure task-scheduling overhead per serve).

Routing the same rows through a pandas DataFrame makes the Arrow
conversion path produce a ``LocalRelation`` instead: plan-time local
data, no RDD, no per-stage empty tasks, and broadcast builds read it
driver-side. Values round-trip exactly (Arrow float64/int64 preserve
IEEE doubles and 64-bit ints bit-for-bit; array<double> cells travel
as Arrow lists) — the ivfpq A/B pinned identical collected results.

Constraints (documented, asserted by use sites' oracles): rows must be
flat tuples/Rows of ints / floats / strings / array-of-primitive in
schema field order; None is only safe in non-integer columns (pandas
would coerce an int column with None to float).
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegralType, StructType

_ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"


def local_frame(
    spark: SparkSession, rows: Sequence, schema: StructType | str
) -> DataFrame:
    """``createDataFrame`` that plans as a ``LocalRelation`` (falls back
    to the classic row path only for empty input, where the plan shape
    is irrelevant).

    The LocalRelation shape only materializes when the Arrow conversion
    path is on; with Arrow off the pandas input would silently degrade
    back to the 32-slice RDD plan. Sessions built by ``session.py`` set
    the conf; for foreign sessions it is a runtime-mutable SQL conf, so
    enable it here (with a warning) rather than losing the plan shape
    silently.
    """
    schema_t = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    )
    if not rows:
        return spark.createDataFrame([], schema_t)
    if spark.conf.get(_ARROW_CONF, "false").lower() != "true":
        warnings.warn(
            f"local_frame: enabling {_ARROW_CONF} on this session — "
            "without it the frozen frame would plan as a sliced RDD "
            "instead of a LocalRelation",
            stacklevel=2,
        )
        spark.conf.set(_ARROW_CONF, "true")
    import pandas as pd

    names = [f.name for f in schema_t.fields]
    pdf = pd.DataFrame(
        [
            tuple(r[n] for n in names) if isinstance(r, dict) else tuple(r)
            for r in rows
        ],
        columns=names,
    )
    # pandas coerces an int column containing None to float, which the
    # Arrow cast would then truncate silently — make misuse loud (the
    # documented constraint; current call sites collect aggregate rows
    # that are never NULL in integer columns).
    for i, f in enumerate(schema_t.fields):
        if isinstance(f.dataType, IntegralType):
            assert not pdf.iloc[:, i].isna().any(), (
                f"local_frame: None in integer column {f.name!r} — pandas "
                "would coerce the column to float"
            )
    return spark.createDataFrame(pdf, schema_t)
