"""As-of join — the generalized form of the reference's previous-version
lookup (SURVEY §2.3 D8, get_previous_atlas_entity
determine_change_job.py:194-226): for each left row, the latest right
row with the same key and right.time <= / < left.time.

The reference runs this as one Elasticsearch top-1 query per record.
Batch Spark expresses it as a union trick that costs ONE shuffle and no
join at all: tag both sides, union on (key, time), and a lag-style
window carries the most recent right-side value forward onto left rows.
This beats the naive (join + filter + row_number) plan, which shuffles
both sides AND explodes the range match before pruning it.

Scale: one shuffle on the key, linear scan within each key partition —
the plan a 100 TB as-of join wants. Skewed keys split via AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: attach the most recent ``right`` row per key.

    ``strict=True`` matches ``right.time < left.time`` (the reference's
    'strictly earlier version' semantics, determine_change_job.py:209);
    ``strict=False`` allows ties (<=).
    """
    on = list(on)
    value_cols = list(value_cols)

    l_tag = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # right rows sort before left on ties
        F.struct(*[F.col(c) for c in left.columns]).alias("_l_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *on,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_l_row"].dataType
        ).alias("_l_row"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    # On strict matching, a right row at the same instant must NOT be
    # visible to the left row: order left BEFORE right on tie.
    tie = F.asc("_side") if not strict else F.desc("_side")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc("_t"), tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # last_value(ignorenulls) over rows up to self carries the latest
    # right-side value forward; with strict ties-ordering the same-time
    # right row sorts after the left row and is excluded automatically.
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_l_row.*"),
        *[F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
