"""State-store query operators (SURVEY §2.4, Q1-Q7) over ``documents``.

The reference's sync job issues point lookups, array-membership scans,
multi-field OR filters, batched multi-gets and deletes against its App
Search document store (synchronize_app_search/elastic.py:43-93,
synchronize_app_search.py:101-115,682-714). Here the document store is a
DataFrame and each store query becomes a filter/semi-join — pagination
(S7/S8, elastic.py:54-86) disappears because scans are set-at-a-time.

``documents.text`` split into a word array plays the ``breadcrumbguid``
array for the membership queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

_LOOKUP_IDS = (3, 7, 42, 99, 123)


def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/S6: doc where id == key — the App Search point get
    (get_document, elastic.py:43-51) and the same-shaped Elasticsearch
    term-query source (S5, determine_change_job.py:223) as one pushed
    parquet filter."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") == 42).select(
        "doc_id", "lang", "source", "n_chars"
    )


POINT_LOOKUP_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id = 42
"""


def batched_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/S6: docs for a list of ids (get_documents, elastic.py:88-93) —
    an IN-list that
    Catalyst turns into a pushed filter; at scale, a broadcast semi-join."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id").isin(*_LOOKUP_IDS))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


MULTIGET_SQL = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE doc_id IN {_LOOKUP_IDS}
ORDER BY doc_id
"""


def array_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q4: docs whose token array contains a key — the descendant
    query `breadcrumbguid CONTAINS guid` (synchronize_app_search.py:101-115)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.array_contains(F.split(F.col("text"), " "), "spark")
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


ARRAY_MEMBER_SQL = """
SELECT doc_id, lang
FROM documents
WHERE list_contains(string_split(text, ' '), 'spark')
ORDER BY doc_id
"""


def multi_field_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: referrer query — OR over several fields
    (update_name_in_derived_entity_fields, synchronize_app_search.py:701-714).
    Membership in any of two token positions or a metadata field."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        docs.filter(
            F.array_contains(words, "merge")
            | F.array_contains(words, "shuffle")
            | (F.col("source") == "src7")
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


MULTI_FIELD_OR_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE list_contains(string_split(text, ' '), 'merge')
   OR list_contains(string_split(text, ' '), 'shuffle')
   OR source = 'src7'
ORDER BY doc_id
"""


def delete_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: the read side of MERGE…DELETE — store state after removing a
    key set (delete_document, synchronize_app_search.py:200-202), i.e. an
    anti-join of the store against the delete batch."""
    docs = load_table(spark, sf_dir, "documents")
    deletes = spark.createDataFrame(
        [(i,) for i in _LOOKUP_IDS], "doc_id bigint"
    )
    return (
        docs.join(F.broadcast(deletes), "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_after_delete"))
        .orderBy("lang")
    )


DELETE_SQL = f"""
SELECT lang, count(*) AS n_docs_after_delete
FROM documents
WHERE doc_id NOT IN {_LOOKUP_IDS}
GROUP BY lang
ORDER BY lang
"""


def schema_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: engine schema keys, sorted (synchronize_app_search.py:337-338).
    Plan-time in Spark; surfaced as a one-row result for the gate."""
    docs = load_table(spark, sf_dir, "documents")
    fields = ",".join(sorted(docs.schema.fieldNames()))
    return spark.createDataFrame([(fields,)], "schema_fields string")


SCHEMA_SQL = """
SELECT array_to_string(list_sort(list(column_name)), ',') AS schema_fields
FROM (DESCRIBE SELECT * FROM documents)
"""


def state_store_lookups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1+Q5+S5+S6 in one proof row: the point get (get_document,
    elastic.py:43-51; ES term query, determine_change_job.py:223) and the
    batched multi-get (get_documents, elastic.py:88-93), tagged by ``op``.
    Both sides are pushed parquet filters; the union is two scans of a
    tiny pruned result, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ("doc_id", "lang", "source", "n_chars")
    point = docs.filter(F.col("doc_id") == 42).select(*cols).withColumn(
        "op", F.lit("point")
    )
    multi = docs.filter(F.col("doc_id").isin(*_LOOKUP_IDS)).select(
        *cols
    ).withColumn("op", F.lit("multiget"))
    return point.unionByName(multi).orderBy("op", "doc_id")


STATE_STORE_LOOKUPS_SQL = f"""
SELECT doc_id, lang, source, n_chars, 'point' AS op
FROM documents WHERE doc_id = 42
UNION ALL
SELECT doc_id, lang, source, n_chars, 'multiget' AS op
FROM documents WHERE doc_id IN {_LOOKUP_IDS}
ORDER BY op, doc_id
"""


def store_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2+Q3+S8 in one proof row: the descendant array-membership scan
    (`breadcrumbguid CONTAINS guid`, synchronize_app_search.py:101-115)
    and the multi-field OR referrer query
    (update_name_in_derived_entity_fields, :701-714), tagged by ``op``."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    member = (
        docs.filter(F.array_contains(words, "spark"))
        .select("doc_id", "lang", "source")
        .withColumn("op", F.lit("descendants"))
    )
    referrer = (
        docs.filter(
            F.array_contains(words, "merge")
            | F.array_contains(words, "shuffle")
            | (F.col("source") == "src7")
        )
        .select("doc_id", "lang", "source")
        .withColumn("op", F.lit("referrers"))
    )
    return member.unionByName(referrer).orderBy("op", "doc_id")


STORE_FILTER_SCAN_SQL = """
SELECT doc_id, lang, source, 'descendants' AS op
FROM documents
WHERE list_contains(string_split(text, ' '), 'spark')
UNION ALL
SELECT doc_id, lang, source, 'referrers' AS op
FROM documents
WHERE list_contains(string_split(text, ' '), 'merge')
   OR list_contains(string_split(text, ' '), 'shuffle')
   OR source = 'src7'
ORDER BY op, doc_id
"""


QUERIES = {
    "state_store_lookups": state_store_lookups,
    "store_filter_scan": store_filter_scan,
    "point_lookup": point_lookup,
    "batched_multiget": batched_multiget,
    "array_membership": array_membership,
    "multi_field_or": multi_field_or,
    "delete_by_id": delete_by_id,
    "schema_introspection": schema_introspection,
}

ORACLES = {
    "state_store_lookups": STATE_STORE_LOOKUPS_SQL,
    "store_filter_scan": STORE_FILTER_SCAN_SQL,
    "point_lookup": POINT_LOOKUP_SQL,
    "batched_multiget": MULTIGET_SQL,
    "array_membership": ARRAY_MEMBER_SQL,
    "multi_field_or": MULTI_FIELD_OR_SQL,
    "delete_by_id": DELETE_SQL,
    "schema_introspection": SCHEMA_SQL,
}
