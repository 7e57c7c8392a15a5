"""Graph / hierarchy-maintenance queries (SURVEY §2.5, G1-G4, G9).

The driver gate runs these against DuckDB recursive CTEs over the same
literal edge set — the Spark side uses the iterative-join fixpoint from
``functions.hierarchy`` (broadcast-dimension design for 100 TB streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hierarchy import (
    BUSINESS_SOURCE_TYPES,
    HIERARCHY_MAPPING,
    M4I_BASE_TYPES,
    TYPE_EDGES,
    breadcrumb_paths_df,
    supertype_closure_df,
)


def _edges_values_sql(alias: str = "edges") -> str:
    rows = ", ".join(f"('{c}', '{p}')" for c, p in TYPE_EDGES)
    return f"(VALUES {rows}) AS {alias}(typename, supertype)"


def _hierarchy_values_sql(alias: str = "h") -> str:
    rows = ", ".join(f"('{c}', '{p}')" for c, p in HIERARCHY_MAPPING.items())
    return f"(VALUES {rows}) AS {alias}(typename, parent)"


def supertype_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: transitive supertype closure of the type DAG.
    Reference: get_super_types (synchronize_app_search.py:27-48) —
    per-record recursive REST over the type-def lookup (S14,
    get_type_def, synchronize_app_search.py:30); here a one-time
    fixpoint join producing a broadcast dimension."""
    return supertype_closure_df(spark).select(
        "typename",
        F.array_join("supertypes", ",").alias("supertypes"),
        F.size("supertypes").alias("n_supertypes"),
    ).orderBy("typename")


SUPERTYPE_CLOSURE_SQL = f"""
WITH RECURSIVE closure(typename, supertype) AS (
    SELECT typename, supertype FROM {_edges_values_sql()}
    UNION
    SELECT c.typename, e.supertype
    FROM closure c
    JOIN {_edges_values_sql('e')}
      ON c.supertype = e.typename
)
SELECT typename,
       array_to_string(list_sort(list(DISTINCT supertype)), ',') AS supertypes,
       count(DISTINCT supertype) AS n_supertypes
FROM closure
GROUP BY typename
ORDER BY typename
"""


def source_type_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2+G3: Business iff any business base type is in {self} ∪ closure,
    else Technical; m4isourcetype = intersection with the 7 base types.
    Reference: get_source_type / get_m4i_source_types
    (synchronize_app_search.py:55-60, :95-99)."""
    closure = supertype_closure_df(spark)
    with_self = closure.select(
        "typename",
        F.array_sort(
            F.array_union("supertypes", F.array(F.col("typename")))
        ).alias("closure_and_self"),
    )
    return with_self.select(
        "typename",
        F.when(
            F.arrays_overlap(
                "closure_and_self",
                F.lit(list(BUSINESS_SOURCE_TYPES)),
            ),
            F.lit("Business"),
        )
        .otherwise(F.lit("Technical"))
        .alias("sourcetype"),
        F.array_join(
            F.array_sort(
                F.array_intersect("closure_and_self", F.lit(list(M4I_BASE_TYPES)))
            ),
            ",",
        ).alias("m4isourcetype"),
    ).orderBy("typename")


_BUSINESS_LIST = ", ".join(f"'{t}'" for t in BUSINESS_SOURCE_TYPES)
_BASE_LIST = ", ".join(f"'{t}'" for t in M4I_BASE_TYPES)

SOURCE_TYPE_SQL = f"""
WITH RECURSIVE closure(typename, supertype) AS (
    SELECT typename, supertype FROM {_edges_values_sql()}
    UNION
    SELECT c.typename, e.supertype
    FROM closure c
    JOIN {_edges_values_sql('e')}
      ON c.supertype = e.typename
), with_self AS (
    SELECT typename,
           list_sort(list_distinct(list(supertype) || [typename])) AS closure_and_self
    FROM closure
    GROUP BY typename
)
SELECT typename,
       CASE WHEN len(list_intersect(closure_and_self, [{_BUSINESS_LIST}])) > 0
            THEN 'Business' ELSE 'Technical' END AS sourcetype,
       coalesce(array_to_string(list_sort(list_intersect(closure_and_self, [{_BASE_LIST}])), ','), '') AS m4isourcetype
FROM with_self
ORDER BY typename
"""


def breadcrumb_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: ancestor path root→parent per type over the containment map
    (define_breadcrumb, synchronize_app_search.py:467-482)."""
    return breadcrumb_paths_df(spark).select(
        "typename",
        F.array_join("breadcrumbtype", ",").alias("breadcrumbtype"),
        F.size("breadcrumbtype").alias("breadcrumb_depth"),
    ).orderBy("typename")


BREADCRUMB_SQL = f"""
WITH RECURSIVE path(typename, parent, depth) AS (
    SELECT typename, parent, 1 FROM {_hierarchy_values_sql()}
    UNION ALL
    SELECT p.typename, h.parent, p.depth + 1
    FROM path p
    JOIN {_hierarchy_values_sql('h')}
      ON p.parent = h.typename
)
SELECT typename,
       array_to_string(list(parent ORDER BY depth DESC), ',') AS breadcrumbtype,
       count(*) AS breadcrumb_depth
FROM path
GROUP BY typename
ORDER BY typename
"""


def parent_type_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: static child-type → parent-type map as a broadcast literal
    (get_parent_type, synchronize_app_search.py:74-76; HierarchyMapping.py:3-9)."""
    mapping = F.create_map(
        *[F.lit(x) for pair in HIERARCHY_MAPPING.items() for x in pair]
    )
    types = spark.createDataFrame(
        [(t,) for t in sorted(set(HIERARCHY_MAPPING) | set(HIERARCHY_MAPPING.values()))],
        "typename string",
    )
    return types.select(
        "typename",
        F.coalesce(mapping[F.col("typename")], F.lit("(root)")).alias("parent_type"),
    ).orderBy("typename")


_PARENT_CASES = " ".join(
    f"WHEN '{c}' THEN '{p}'" for c, p in HIERARCHY_MAPPING.items()
)
_ALL_TYPES = ", ".join(
    f"('{t}')" for t in sorted(set(HIERARCHY_MAPPING) | set(HIERARCHY_MAPPING.values()))
)

PARENT_TYPE_SQL = f"""
SELECT typename,
       coalesce(CASE typename {_PARENT_CASES} END, '(root)') AS parent_type
FROM (VALUES {_ALL_TYPES}) AS t(typename)
ORDER BY typename
"""


def type_hierarchy_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G4+S14 in one proof row: the transitive supertype closure
    (get_super_types, synchronize_app_search.py:27-48, over the S14
    type-def lookup :30) and the containment parent-type map
    (get_parent_type, :74-76; HierarchyMapping.py:3-9), tagged by ``op``.
    Both sides are literal broadcast dimensions — no data-scale scan."""
    closure = supertype_closure_df(spark).select(
        "typename",
        F.lit("supertype_closure").alias("op"),
        F.array_join("supertypes", ",").alias("value"),
    )
    mapping = F.create_map(
        *[F.lit(x) for pair in HIERARCHY_MAPPING.items() for x in pair]
    )
    types = spark.createDataFrame(
        [(t,) for t in sorted(set(HIERARCHY_MAPPING) | set(HIERARCHY_MAPPING.values()))],
        "typename string",
    )
    parents = types.select(
        "typename",
        F.lit("parent_type").alias("op"),
        F.coalesce(mapping[F.col("typename")], F.lit("(root)")).alias("value"),
    )
    return closure.unionByName(parents).orderBy("op", "typename")


TYPE_HIERARCHY_OPS_SQL = f"""
WITH RECURSIVE closure(typename, supertype) AS (
    SELECT typename, supertype FROM {_edges_values_sql()}
    UNION
    SELECT c.typename, e.supertype
    FROM closure c
    JOIN {_edges_values_sql('e')}
      ON c.supertype = e.typename
)
SELECT typename,
       'supertype_closure' AS op,
       array_to_string(list_sort(list(DISTINCT supertype)), ',') AS value
FROM closure
GROUP BY typename
UNION ALL
SELECT typename,
       'parent_type' AS op,
       coalesce(CASE typename {_PARENT_CASES} END, '(root)') AS value
FROM (VALUES {_ALL_TYPES}) AS t(typename)
ORDER BY op, typename
"""


QUERIES = {
    "type_hierarchy_ops": type_hierarchy_ops,
    "supertype_closure": supertype_closure,
    "source_type_classification": source_type_classification,
    "breadcrumb_paths": breadcrumb_paths,
    "parent_type_lookup": parent_type_lookup,
}

ORACLES = {
    "type_hierarchy_ops": TYPE_HIERARCHY_OPS_SQL,
    "supertype_closure": SUPERTYPE_CLOSURE_SQL,
    "source_type_classification": SOURCE_TYPE_SQL,
    "breadcrumb_paths": BREADCRUMB_SQL,
    "parent_type_lookup": PARENT_TYPE_SQL,
}
