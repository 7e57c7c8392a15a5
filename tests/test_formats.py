"""Multi-format ingest round-trips: every supported format must read
back exactly what was written (within each format's documented
fidelity), and the scan-layer optimizations must hold where claimed
(ORC pushes predicates; CSV/JSON at least prune columns)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.sources.formats import (
    read_any,
    sniff_format,
    write_any,
)


def _sorted_rows(df, key):
    return sorted(map(tuple, df.collect()), key=lambda t: t[: len(key)])


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_customer_roundtrip_all_formats(spark, sf_dir, fmt, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / f"customer.{fmt}")
    write_any(src, out, fmt)
    got = read_any(spark, out, schema=src.schema if fmt in ("csv", "json") else None)
    assert [f.simpleString() for f in got.schema.fields] == [
        f.simpleString() for f in src.schema.fields
    ]
    assert _sorted_rows(got, ["c_custkey"]) == _sorted_rows(src, ["c_custkey"])


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_events_timestamps_roundtrip(spark, sf_dir, fmt, tmp_path):
    """Microsecond timestamps survive the text formats via the pinned
    timestampFormat (the Spark default silently truncates on CSV)."""
    src = load_table(spark, sf_dir, "events").limit(500)
    out = str(tmp_path / f"events.{fmt}")
    write_any(src, out, fmt)
    got = read_any(spark, out, schema=src.schema if fmt in ("csv", "json") else None)
    a = _sorted_rows(got, ["event_id"])
    b = _sorted_rows(src, ["event_id"])
    assert a == b


def test_orc_roundtrips_nested_embeddings(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path / "embeddings.orc")
    write_any(src, out, "orc")
    got = read_any(spark, out)
    assert _sorted_rows(got, ["vec_id"]) == _sorted_rows(src, ["vec_id"])


def test_csv_refuses_nested_columns(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="csv cannot represent"):
        write_any(src, str(tmp_path / "bad.csv"), "csv")


def test_csv_requires_schema_on_read(spark, tmp_path):
    with pytest.raises(ValueError, match="requires an explicit schema"):
        read_any(spark, str(tmp_path / "x.csv"))


def test_sniff_format():
    assert sniff_format("/a/b/events.jsonl") == "json"
    assert sniff_format("/a/b/t.csv") == "csv"
    assert sniff_format("/a/b/t.orc") == "orc"
    assert sniff_format("/a/b/t.parquet") == "parquet"
    assert sniff_format("/a/b/bare_dir") == "parquet"


def test_orc_pushes_predicates_csv_prunes_columns(spark, sf_dir, tmp_path):
    """The documented scan posture: ORC scans show pushed filters
    (like parquet); CSV cannot push predicates but the read schema
    must still shrink to the selected columns."""
    src = load_table(spark, sf_dir, "customer")
    orc_path = str(tmp_path / "c.orc")
    csv_path = str(tmp_path / "c.csv")
    write_any(src, orc_path, "orc")
    write_any(src, csv_path, "csv")

    orc_plan = (
        read_any(spark, orc_path)
        .filter(F.col("c_custkey") == 7)
        .select("c_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in orc_plan
    assert "IsNotNull(c_custkey)" in orc_plan or "EqualTo(c_custkey" in orc_plan

    csv_plan = (
        read_any(spark, csv_path, schema=src.schema)
        .select("c_name", "c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema" in csv_plan
    # pruned: the read schema mentions the 2 selected fields, not all 8
    read_schema = csv_plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_name" in read_schema and "c_acctbal" not in read_schema


def test_orc_interchange_query_pushes_filter(spark, sf_dir):
    """The registered orc_interchange_read query's ship-date filter
    must reach the ORC stripe reader (PushedFilters on the ORC scan),
    and only the five staged columns may be read."""
    from m4i_flink_tasks_spark.queries.cdc import orc_interchange_read

    df = orc_interchange_read(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]
