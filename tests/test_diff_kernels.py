"""Unit tests for the entity-diff kernels (SURVEY §2.3 D1-D6) and the
Atlas schema codecs (SURVEY §7.1 step 1: from_json/to_json round-trip).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.diff import (
    attribute_diff_struct,
    changed_keys,
    deleted_keys,
    deleted_relationships,
    drop_list_values,
    drop_null_values,
    has_attribute_diff,
    inserted_keys,
    inserted_relationships,
)
from m4i_flink_tasks_spark.schemas import ENRICHED_ENTITY, ENTITY_MESSAGE


def _attr_pair(spark, old: dict | None, new: dict | None):
    return spark.createDataFrame(
        [(old, new)], "old map<string,string>, new map<string,string>"
    )


def test_attribute_key_diffs(spark):
    df = _attr_pair(
        spark,
        {"a": "1", "b": "2", "c": "3"},
        {"b": "2", "c": "changed", "d": "4"},
    ).select(
        inserted_keys(F.col("old"), F.col("new")).alias("ins"),
        deleted_keys(F.col("old"), F.col("new")).alias("del"),
        changed_keys(F.col("old"), F.col("new")).alias("chg"),
    )
    row = df.collect()[0]
    assert row.ins == ["d"]
    assert row["del"] == ["a"]
    assert row.chg == ["c"]


def test_attribute_diff_null_and_empty_maps(spark):
    # CREATE: old side absent -> every key inserted
    # (determine_change_job.py:282-306); DELETE symmetric (:254-279).
    row = (
        _attr_pair(spark, None, {"x": "1", "y": "2"})
        .select(
            inserted_keys(F.col("old"), F.col("new")).alias("ins"),
            deleted_keys(F.col("old"), F.col("new")).alias("del"),
        )
        .collect()[0]
    )
    assert row.ins == ["x", "y"] and row["del"] == []

    row = (
        _attr_pair(spark, {"x": "1"}, None)
        .select(deleted_keys(F.col("old"), F.col("new")).alias("del"))
        .collect()[0]
    )
    assert row["del"] == ["x"]


def test_changed_keys_is_null_safe(spark):
    # NULL vs non-NULL values on a shared key count as changed.
    row = (
        _attr_pair(spark, {"k": None, "j": "1"}, {"k": "v", "j": "1"})
        .select(changed_keys(F.col("old"), F.col("new")).alias("chg"))
        .collect()[0]
    )
    assert row.chg == ["k"]


def test_map_cleanup_p7_p8(spark):
    # P7/P8 (determine_change_job.py:53-65): strip list-valued and
    # null-valued entries before the attribute diff.
    df = _attr_pair(
        spark, {"a": "1", "b": None, "c": '["x","y"]', "d": " [1]"}, None
    ).select(
        F.map_keys(drop_null_values(F.col("old"))).alias("no_nulls"),
        F.map_keys(drop_list_values(F.col("old"))).alias("no_lists"),
    )
    row = df.collect()[0]
    assert sorted(row.no_nulls) == ["a", "c", "d"]
    assert sorted(row.no_lists) == ["a", "b"]


def test_attribute_diff_struct_and_gate(spark):
    df = _attr_pair(spark, {"a": "1"}, {"a": "1"}).select(
        attribute_diff_struct(F.col("old"), F.col("new")).alias("d")
    )
    assert df.select(has_attribute_diff(F.col("d")).alias("g")).collect()[0].g is False


_REL_T = "map<string, array<struct<guid:string, type_name:string>>>"


def test_relationship_diffs_are_set_based_both_ways(spark):
    old = {
        "children": [("g1", "t"), ("g2", "t")],
        "meanings": [("m1", "t")],
    }
    new = {
        "children": [("g2", "t"), ("g3", "t")],  # g3 added, g1 removed
        "meanings": [("m1", "t")],  # unchanged -> dropped from both diffs
    }
    df = spark.createDataFrame([(old, new)], f"old {_REL_T}, new {_REL_T}").select(
        inserted_relationships(F.col("old"), F.col("new")).alias("ins"),
        deleted_relationships(F.col("old"), F.col("new")).alias("del"),
    )
    row = df.collect()[0]
    assert set(row.ins.keys()) == {"children"}
    assert [r.guid for r in row.ins["children"]] == ["g3"]
    assert set(row["del"].keys()) == {"children"}
    assert [r.guid for r in row["del"]["children"]] == ["g1"]


def test_relationship_diff_with_missing_key(spark):
    # A key present only on one side: all its elements inserted/deleted.
    df = spark.createDataFrame(
        [({}, {"links": [("g9", "t")]})], f"old {_REL_T}, new {_REL_T}"
    ).select(
        inserted_relationships(F.col("old"), F.col("new")).alias("ins"),
        deleted_relationships(F.col("old"), F.col("new")).alias("del"),
    )
    row = df.collect()[0]
    assert [r.guid for r in row.ins["links"]] == ["g9"]
    assert row["del"] == {}


def test_enriched_envelope_json_round_trip(spark):
    # The envelope the reference passes between jobs 1->2/3
    # (get_entity_job.py:54, validated publish_state_job.py:56-69):
    # to_json(from_json(x)) must preserve the validated fields.
    payload = {
        "kafka_notification": {
            "operation_type": "ENTITY_UPDATE",
            "entity_guid": "g-1",
            "event_time": 1656493552392,
        },
        "atlas_entity": {
            "guid": "g-1",
            "type_name": "m4i_data_domain",
            "attributes": {"name": "Dom", "definition": None},
            "update_time": 1656493552392,
        },
    }
    import json

    df = spark.createDataFrame([(json.dumps(payload),)], "value string").select(
        F.from_json("value", ENRICHED_ENTITY).alias("msg")
    )
    row = df.collect()[0].msg
    assert row.kafka_notification.operation_type == "ENTITY_UPDATE"
    assert row.atlas_entity.attributes["name"] == "Dom"
    assert row.atlas_entity.update_time == 1656493552392

    back = json.loads(
        df.select(F.to_json("msg").alias("j")).collect()[0].j
    )
    assert back["atlas_entity"]["guid"] == "g-1"


def test_entity_message_schema_accepts_fixture_shape(spark):
    import json

    msg = {
        "type_name": "m4i_data_entity",
        "guid": "e1",
        "event_type": "EntityAttributeAudit",
        "direct_change": True,
        "inserted_attributes": ["definition"],
        "changed_attributes": [],
        "deleted_attributes": [],
        "inserted_relationships": {
            "meanings": [{"guid": "m1", "type_name": "m4i_meaning"}]
        },
    }
    row = (
        spark.createDataFrame([(json.dumps(msg),)], "value string")
        .select(F.from_json("value", ENTITY_MESSAGE).alias("m"))
        .collect()[0]
        .m
    )
    assert row.event_type == "EntityAttributeAudit"
    assert row.inserted_attributes == ["definition"]
    assert row.inserted_relationships["meanings"][0].guid == "m1"


def test_streaming_entity_diff_columns_edge_cases(spark):
    """The streaming differ's EntityMessage-shaped formatting over the
    D1-D6 kernels: CREATE (NULL prev), pure insert/delete/change,
    relationship add+remove in one step, and the no-op case."""
    from m4i_flink_tasks_spark.streaming.determine_change import (
        entity_diff_columns,
    )

    schema = (
        "event_id bigint, user_id bigint, "
        "attrs map<string,string>, rels map<string,array<string>>, "
        "prev_attrs map<string,string>, prev_rels map<string,array<string>>"
    )
    rows = [
        # CREATE: everything inserts, every guid adds.
        (1, 1, {"a": "1", "b": "2"}, {"r": ["x", "y"]}, None, None),
        # UPDATE: a changed, b deleted, c inserted; r loses x gains z.
        (2, 1, {"a": "9", "c": "3"}, {"r": ["y", "z"]},
         {"a": "1", "b": "2"}, {"r": ["x", "y"]}),
        # No-op: identical maps (list order differences are set-equal).
        (3, 1, {"a": "9"}, {"r": ["z", "y"]}, {"a": "9"}, {"r": ["y", "z"]}),
        # Relationship key disappears entirely.
        (4, 1, {"a": "9"}, {}, {"a": "9"}, {"r": ["y"]}),
    ]
    out = {
        r.event_id: r
        for r in entity_diff_columns(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert out[1].change_kind == "EntityCreated"
    assert out[1].inserted_attrs == "a=1|b=2"
    assert out[1].added_rels == "r:x,y"
    assert out[1].deleted_rels == ""

    assert out[2].change_kind == "EntityChanged"
    assert out[2].inserted_attrs == "c=3"
    assert out[2].changed_attrs == "a=9"
    assert out[2].deleted_attrs == "b"
    assert out[2].added_rels == "r:z"
    assert out[2].deleted_rels == "r:x"

    assert out[3].change_kind == "EntityUnchanged"
    assert (out[3].inserted_attrs, out[3].changed_attrs, out[3].deleted_attrs,
            out[3].added_rels, out[3].deleted_rels) == ("", "", "", "", "")

    assert out[4].change_kind == "EntityChanged"
    assert out[4].deleted_rels == "r:y"
    assert out[4].added_rels == ""
