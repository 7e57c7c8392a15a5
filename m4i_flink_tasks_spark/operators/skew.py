"""Skew mitigation — explicit key salting for joins AQE cannot fix.

AQE's skew-join splitting (enabled in ``session.py``) handles skewed
*sort-merge* joins at runtime by splitting oversized partitions, but it
only triggers on map-output statistics and cannot help when a hot key's
rows must meet a non-broadcastable build side, or inside aggregations
over pathological key distributions. The classic manual remedy — named
in every large-scale Spark playbook — is salting: widen the hot key with
a uniform salt in ``[0, n)``, replicate the other side across all ``n``
salt values, and join on ``(key, salt)`` so each hot key spreads over
``n`` reducers instead of melting one.

The reference never needs this (parallelism=1 has no shuffles,
SURVEY §4.1), but its guid-keyed streams at 100 TB would: a handful of
chatty entities dominating the change stream is exactly the hot-key
shape. Semantics are join-identical; only the physical spread changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (large, skewed on ``on``) with ``right``
    (small-ish but above the broadcast threshold) on ``(on, salt)``.

    The left side gets a deterministic row-spread salt (row id modulo
    ``n_salts`` — no RNG, so re-runs of a failed stage produce the same
    assignment); the right side is replicated ``n_salts`` times via an
    inline explode. The join is hinted ``shuffle_hash``: at the scale
    where salting matters the build side does not fit the broadcast
    threshold, and a sort-merge join would re-introduce the skewed sort.

    Result columns = left columns + right's non-key columns, exactly as
    the unsalted join; the salt never escapes.

    Only ``inner`` and ``left`` are supported: the right side is
    replicated across all ``n_salts`` values, so a right/full outer
    join would emit each unmatched right row ``n_salts`` times.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            "replicated right side would duplicate unmatched right rows"
        )
    salt_col = "__salt"
    salted_left = left.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salted_right = right.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return (
        salted_left.join(salted_right.hint("shuffle_hash"), [on, salt_col], how)
        .drop(salt_col)
    )
