"""Property-based tests (hypothesis) for the attribute-diff kernels —
the algebraic laws the reference's `or`-bugged guards break (SURVEY
§7.4): the clean key-set semantics must hold for EVERY map pair, not
just the golden fixtures.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.diff import (
    changed_keys,
    deleted_keys,
    inserted_keys,
)

_keys_st = st.text(
    alphabet="abcdefgh", min_size=1, max_size=3
)
_vals_st = st.one_of(st.none(), st.text(alphabet="xyz01", max_size=3))
_map_st = st.one_of(
    st.none(), st.dictionaries(_keys_st, _vals_st, max_size=6)
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _diff(spark, old, new):
    row = (
        spark.createDataFrame(
            [(old, new)], "old map<string,string>, new map<string,string>"
        )
        .select(
            inserted_keys(F.col("old"), F.col("new")).alias("ins"),
            deleted_keys(F.col("old"), F.col("new")).alias("dele"),
            changed_keys(F.col("old"), F.col("new")).alias("chg"),
        )
        .collect()[0]
    )
    return set(row.ins), set(row.dele), set(row.chg)


@given(m=_map_st)
@_SETTINGS
def test_self_diff_is_empty(spark, m):
    ins, dele, chg = _diff(spark, m, m)
    assert ins == dele == chg == set()


@given(old=_map_st, new=_map_st)
@_SETTINGS
def test_diff_laws(spark, old, new):
    ins, dele, chg = _diff(spark, old, new)
    ko = set(old or {})
    kn = set(new or {})
    # Key-set semantics (D2/D4): inserted/deleted are exactly the
    # asymmetric differences.
    assert ins == kn - ko
    assert dele == ko - kn
    # Changed keys (D1/D3) live in the intersection, with NULL-safe
    # value inequality.
    assert chg == {
        k for k in ko & kn if (old or {})[k] != (new or {})[k]
    }
    # Reconstruction: old keys edited by the diff give new keys.
    assert (ko - dele) | ins == kn


@given(old=_map_st, new=_map_st)
@_SETTINGS
def test_diff_antisymmetry(spark, old, new):
    ins, dele, chg = _diff(spark, old, new)
    ins2, dele2, chg2 = _diff(spark, new, old)
    assert ins == dele2 and dele == ins2 and chg == chg2
