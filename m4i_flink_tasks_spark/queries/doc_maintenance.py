"""Doc-store graph-maintenance queries (SURVEY §2.5 G9/G12/G20 + §2.4 Q2)
run at data scale over the testdata's natural containment hierarchy
region ⊃ nation ⊃ customer — the stand-in for system ⊃ collection ⊃
dataset. Each query drives the same ``operators.docstore`` kernels the
golden unit tests pin, so the DuckDB gate checks them against plain SQL
on real table volumes.

Scale notes: breadcrumb materialization is two broadcast joins (nation
and region are tiny dims); descendant selection is one
``array_contains`` scan (no join); rename propagation is a codegen'd
``zip_with`` — none of these shuffle the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.docstore import (
    descendants_of,
    insert_breadcrumb_prefix,
    rename_in_breadcrumbs,
)
from ..sources import load_table


def _customer_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9 define_breadcrumb at scale: every customer doc carries the
    ancestor path [region, nation] (guid/name/type index-aligned)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.concat(F.lit("C"), F.col("c_custkey")).alias("guid"),
            F.col("c_name").alias("name"),
            F.array(
                F.concat(F.lit("R"), F.col("r_regionkey")),
                F.concat(F.lit("N"), F.col("n_nationkey")),
            ).alias("breadcrumbguid"),
            F.array(F.col("r_name"), F.col("n_name")).alias("breadcrumbname"),
            F.array(F.lit("region"), F.lit("nation")).alias("breadcrumbtype"),
        )
    )


def breadcrumb_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array columns are serialized with array_join at the query boundary:
    # the driver's oracle canonicalizer hashes scalar cells only. The
    # kernels themselves stay array-typed (pinned by tests/test_docstore.py).
    docs = _customer_docs(spark, sf_dir)
    return docs.select(
        "guid",
        "name",
        F.array_join("breadcrumbguid", "|").alias("breadcrumbguid"),
        F.array_join("breadcrumbname", "|").alias("breadcrumbname"),
        F.array_join("breadcrumbtype", "|").alias("breadcrumbtype"),
    ).orderBy("guid")


BREADCRUMB_MATERIALIZATION_SQL = """
SELECT 'C' || c_custkey AS guid,
       c_name AS name,
       'R' || r_regionkey || '|' || 'N' || n_nationkey AS breadcrumbguid,
       r_name || '|' || n_name AS breadcrumbname,
       'region|nation' AS breadcrumbtype
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
ORDER BY guid
"""


def descendant_prefix_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 + G12: select the descendants of nation N7 by breadcrumb
    membership, then prepend a new root ancestor to each
    (insert_prefix_to_breadcrumbs_of_child_entities,
    synchronize_app_search.py:231-244)."""
    docs = _customer_docs(spark, sf_dir)
    desc = descendants_of(docs, "N7")
    out = insert_breadcrumb_prefix(
        desc, F.lit("ROOT"), F.lit("Root"), F.lit("m4i_system")
    )
    return out.select(
        "guid",
        F.array_join("breadcrumbguid", "|").alias("breadcrumbguid"),
        F.array_join("breadcrumbname", "|").alias("breadcrumbname"),
        F.array_join("breadcrumbtype", "|").alias("breadcrumbtype"),
    ).orderBy("guid")


DESCENDANT_PREFIX_SQL = """
SELECT 'C' || c_custkey AS guid,
       'ROOT|R' || r_regionkey || '|' || 'N' || n_nationkey AS breadcrumbguid,
       'Root|' || r_name || '|' || n_name AS breadcrumbname,
       'm4i_system|region|nation' AS breadcrumbtype
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE n_nationkey = 7
ORDER BY guid
"""


def rename_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G20 update_name_in_breadcrumbs (synchronize_app_search.py:598-636)
    + G21 update_name_in_derived_entity_fields (:639-742): nation N3 is
    renamed; every doc whose breadcrumb contains N3 gets the new name at
    N3's position — position-matched via the guid array — and every doc
    whose derived (guid, name) pairs reference N3 gets the matching
    derived-name slot rewritten, untouched slots kept verbatim."""
    from ..operators.docstore import rename_in_derived_fields

    docs = _customer_docs(spark, sf_dir)
    # Derived vocabulary: each customer references its nation plus one
    # never-renamed guid, so the position-matched rewrite must change
    # exactly one slot of two.
    docs = docs.withColumn(
        "derivedentityguids",
        F.array(
            F.element_at("breadcrumbguid", -1),
            F.concat(F.lit("X"), F.col("guid")),
        ),
    ).withColumn(
        "derivedentitynames",
        F.array(F.element_at("breadcrumbname", -1), F.col("name")),
    )
    out = rename_in_breadcrumbs(docs, F.lit("N3"), F.lit("NATION_3_RENAMED"))
    out = rename_in_derived_fields(out, F.lit("N3"), F.lit("NATION_3_RENAMED"))
    return out.select(
        "guid",
        F.array_join("breadcrumbname", "|").alias("breadcrumbname"),
        F.array_join("derivedentitynames", "|").alias("derivedentitynames"),
    ).orderBy("guid")


RENAME_PROPAGATION_SQL = """
SELECT 'C' || c_custkey AS guid,
       r_name || '|' ||
       CASE WHEN n_nationkey = 3 THEN 'NATION_3_RENAMED' ELSE n_name END
       AS breadcrumbname,
       CASE WHEN n_nationkey = 3 THEN 'NATION_3_RENAMED' ELSE n_name END
       || '|' || c_name AS derivedentitynames
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
ORDER BY guid
"""


QUERIES = {
    "breadcrumb_materialization": breadcrumb_materialization,
    "descendant_prefix_insert": descendant_prefix_insert,
    "rename_propagation": rename_propagation,
}

ORACLES = {
    "breadcrumb_materialization": BREADCRUMB_MATERIALIZATION_SQL,
    "descendant_prefix_insert": DESCENDANT_PREFIX_SQL,
    "rename_propagation": RENAME_PROPAGATION_SQL,
}
