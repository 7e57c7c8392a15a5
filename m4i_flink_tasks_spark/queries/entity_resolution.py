"""Entity resolution: blocked fuzzy matching + transitive clustering —
the record-linkage pipeline a master-data / dedup system runs.

The reference has no ER surface (SURVEY §2.6 extensions); this is the
classic three-stage dataflow, Spark-first:

    block (equality join on cheap keys) → match (edit-distance
    predicate on the candidate pairs) → cluster (connected components
    over the match graph) → survivorship report.

**Blocking with guaranteed recall.** Names here are equal-length, so
lev <= 1 means at most ONE substituted position; by pigeonhole the
pair agrees exactly on the digits at ODD positions or on the digits at
EVEN positions. Two blocking passes — one per interleaved half —
therefore enumerate EVERY lev<=1 candidate without an all-pairs join
(the "k+1 parts for edit distance k" scheme of PassJoin and friends;
for pure substitution distance the parts may be ANY partition of the
positions). The parts are interleaved rather than contiguous because
sequential ids concentrate their entropy in the LOW digits: a
contiguous leading-prefix block key takes ~1 value over a whole
dataset (measured: the prefix pass at 150k customers degenerated to
~90M candidate pairs), while each interleaved half contains low
digits, keeping block sizes bounded as the table grows. Recall is
pinned against a brute-force twin in tests/test_entity_resolution.py.

**Match rule.** Same nation + same market segment + name edit
distance <= 1. The attribute-agreement terms ride the block join key
(pure hash equality); `levenshtein` evaluates only on candidate pairs
inside a block. Both engines run the same textbook DP, so the
predicate is engine-exact.

**Clustering.** Match pairs feed the shared min-label-propagation
``connected_components`` operator (operators/components.py); the
DuckDB oracle computes the identical clusters with a recursive
reachability CTE, so the component ids (min member id) match
row-for-row.

Scale posture (100 TB): block joins are hash joins on
(segment-of-name, nation, mktsegment) — bounded block sizes by
construction; the pair relation carries two 8-byte ids; components run
on the pair graph only (never the base table); the report caps member
lists with slice-after-sort and the row count with a deterministic
top-N, so output stays bounded at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..sources import load_table

_LEV_MAX = 1
_MEMBER_CAP = 10
_REPORT_CAP = 200

# 1-based positions of the 9 digit characters in "Customer#DDDDDDDDD",
# split into interleaved halves (see module docstring).
_ODD_POS = (10, 12, 14, 16, 18)
_EVEN_POS = (11, 13, 15, 17)


def _interleaved_key(name_col: str, positions: tuple[int, ...]):
    return F.concat(
        *[F.substring(name_col, p, 1) for p in positions]
    )


def _interleaved_key_sql(alias: str, positions: tuple[int, ...]) -> str:
    return " || ".join(
        f"substr({alias}.c_name, {p}, 1)" for p in positions
    )


def _candidate_pairs(customer: DataFrame, block_col) -> DataFrame:
    """One blocking pass: equality on (block segment, nation, segment),
    then the edit-distance match predicate on in-block pairs."""
    side = customer.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        block_col.alias("blk"),
    )
    a = side.alias("a")
    b = side.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= _LEV_MAX
        )
        .select(
            F.col("a.c_custkey").alias("src"),
            F.col("b.c_custkey").alias("dst"),
        )
    )


def entity_match_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-entity clusters over customers (see module docstring).

    Output: the ``_REPORT_CAP`` largest clusters — component id (min
    member id), member count, and the first ``_MEMBER_CAP`` member ids.
    """
    customer = load_table(spark, sf_dir, "customer")
    pairs = (
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
        .union(
            _candidate_pairs(
                customer, _interleaved_key("c_name", _EVEN_POS)
            )
        )
        .distinct()
    )
    labels = connected_components(pairs)
    return (
        labels.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_list("node")), 1, _MEMBER_CAP
                ),
                ",",
            ).alias("members"),
        )
        .orderBy(F.desc("n_members"), "component_id")
        .limit(_REPORT_CAP)
    )


def _pass_sql(positions: tuple[int, ...]) -> str:
    ka = _interleaved_key_sql("a", positions)
    kb = _interleaved_key_sql("b", positions)
    return f"""
    SELECT a.c_custkey AS src, b.c_custkey AS dst
    FROM cust a JOIN cust b
      ON {ka} = {kb}
     AND a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {_LEV_MAX}"""


ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE cust AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer
),
pairs AS (
{_pass_sql(_ODD_POS)}
    UNION
{_pass_sql(_EVEN_POS)}
),
edges AS (
    SELECT src, dst FROM pairs
    UNION
    SELECT dst, src FROM pairs
),
reach(a, b) AS (
    SELECT src, src FROM edges
    UNION
    SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
labeled AS (
    SELECT a AS node, min(b) AS component_id
    FROM reach
    GROUP BY a
)
SELECT component_id,
       count(*) AS n_members,
       array_to_string(
           (list(node ORDER BY node))[1:{_MEMBER_CAP}], ',') AS members
FROM labeled
GROUP BY component_id
ORDER BY n_members DESC, component_id
LIMIT {_REPORT_CAP}
"""

QUERIES = {
    "entity_match_clusters": entity_match_clusters,
}

ORACLES = {
    "entity_match_clusters": ENTITY_CLUSTERS_SQL,
}
