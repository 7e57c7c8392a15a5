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

from ..operators.local_frame import local_frame

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


def cluster_report(pairs: DataFrame) -> DataFrame:
    """The shared clustering readout: connected components over a
    match-pair relation, rolled up to the ``_REPORT_CAP`` largest
    clusters — component id (min member id), member count, and the
    first ``_MEMBER_CAP`` member ids. Used verbatim by the batch query
    below and the streaming clusters twin
    (``streaming/fs_linkage.py``)."""
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


def _deterministic_pairs(customer: DataFrame) -> DataFrame:
    """The deterministic-rule match graph (both halves passes +
    distinct) — shared by the clusters report and survivorship."""
    return (
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
        .union(
            _candidate_pairs(
                customer, _interleaved_key("c_name", _EVEN_POS)
            )
        )
        .distinct()
    )


def entity_match_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-entity clusters over customers (see module docstring).

    Output: the ``_REPORT_CAP`` largest clusters — component id (min
    member id), member count, and the first ``_MEMBER_CAP`` member ids.
    """
    customer = load_table(spark, sf_dir, "customer")
    return cluster_report(_deterministic_pairs(customer))


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


_LABELED_CTE_SQL = f"""
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
)"""

ENTITY_CLUSTERS_SQL = f"""{_LABELED_CTE_SQL}
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


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter, "A
# Theory for Record Linkage", JASA 1969) — the probabilistic
# counterpart of the deterministic match rule above: each candidate
# pair gets a log-likelihood-ratio score sum_f w_f, where w_f =
# ln(m_f/u_f) when field f agrees and ln((1-m_f)/(1-u_f)) when it
# disagrees, and the score is banded into link / possible / non-link
# by two thresholds.
#
# The m/u parameters here are FIXED published stand-ins (a real
# deployment estimates them by EM over the agreement-vector counts —
# same scoring plan, different literals). Weights are embedded as
# INTEGER MICRO-UNITS computed once in Python (the _NDCG_DISC
# convention), so the pair score is an order-free integer sum and the
# band cliffs are integer comparisons — engine-exact by construction.
#
# Blocking: a 2-of-3 parts scheme over the name digits, tighter than
# the deterministic pipeline's halves. The nine digit positions split
# into three STRIDE-3 parts (each containing one low-entropy-killing
# low digit); a lev <= 1 pair (at most ONE substituted position —
# names are equal-length, module docstring) disagrees in at most one
# part, so by pigeonhole it agrees on at least one of the three part
# PAIRS — three passes keyed on 6 digits each enumerate every lev <= 1
# candidate (the k+2-parts generalization of the halves scheme), with
# block sizes ~10-100x smaller than the 4/5-digit halves: the halves'
# measured pair law was superlinear (19.5x pairs at 10x rows, sequential
# ids populating new digits), the 6-digit keys keep candidates
# near-linear. Nation rides as a blocking conjunct (a blocked field
# contributes no weight — standard FS practice); unlike the
# deterministic rule, segment equality and the edit-distance predicate
# move from the join into the SCORED FIELDS, so disagreeing pairs are
# scored rather than discarded. Scored fields: name (lev <= 1),
# market segment, account-balance thousand-bucket. Recall of the
# 2-of-3 enumeration is pinned against brute force in
# tests/test_entity_resolution.py.
# --------------------------------------------------------------------------

# stride-3 parts of the 9 digit positions (10..18); part pairs below.
_FS_PARTS = ((10, 13, 16), (11, 14, 17), (12, 15, 18))
_FS_PART_PAIRS = (
    _FS_PARTS[0] + _FS_PARTS[1],
    _FS_PARTS[0] + _FS_PARTS[2],
    _FS_PARTS[1] + _FS_PARTS[2],
)

_FS_MU = {
    # field -> (m = P(agree | match), u = P(agree | non-match))
    "name": (0.95, 0.01),
    "segment": (0.90, 0.20),
    "balance": (0.70, 0.10),
}


def _fs_weights() -> dict[str, tuple[int, int]]:
    """(agreement, disagreement) log-ratio weights in integer
    micro-units, computed once in Python and embedded as literals in
    both engines."""
    import math

    return {
        f: (
            round(math.log(m / u) * 1_000_000),
            round(math.log((1 - m) / (1 - u)) * 1_000_000),
        )
        for f, (m, u) in _FS_MU.items()
    }


_FS_W = _fs_weights()
_FS_T_LINK = 2_000_000  # ln-odds >= 2  -> link
_FS_T_POSSIBLE = -1_000_000  # ln-odds >= -1 -> possible, else non-link


def _fs_candidates(customer: DataFrame, block_col) -> DataFrame:
    side = customer.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        (
            (F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(100_000))
            .cast("long")
        ).alias("bb"),
        block_col.alias("blk"),
    )
    a, b = side.alias("a"), side.alias("b")
    return a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("src"),
        F.col("b.c_custkey").alias("dst"),
        (F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= _LEV_MAX)
        .alias("ag_name"),
        (F.col("a.c_mktsegment") == F.col("b.c_mktsegment")).alias(
            "ag_segment"
        ),
        (F.col("a.bb") == F.col("b.bb")).alias("ag_balance"),
    )


def fs_band_report(pairs: DataFrame) -> DataFrame:
    """The shared banding readout: integer micro-unit LLR score and
    the three-band aggregate over a scored candidate-pair relation
    (columns ``ag_name``/``ag_segment``/``ag_balance``). Used verbatim
    by the batch query below and the streaming linkage twin
    (``streaming/fs_linkage.py``), so both engines band identically."""
    score = sum(
        F.when(F.col(f"ag_{f}"), F.lit(wa)).otherwise(F.lit(wd))
        for f, (wa, wd) in sorted(_FS_W.items())
    )
    banded = pairs.select(
        score.alias("score_micro"),
        F.col("ag_name").cast("long").alias("is_lev_match"),
    ).select(
        F.when(F.col("score_micro") >= _FS_T_LINK, "1 link")
        .when(F.col("score_micro") >= _FS_T_POSSIBLE, "2 possible")
        .otherwise("3 non-link")
        .alias("band"),
        "score_micro",
        "is_lev_match",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("score_micro").alias("min_score_micro"),
            F.max("score_micro").alias("max_score_micro"),
            F.sum("is_lev_match").alias("n_lev_matches"),
        )
        .orderBy("band")
    )


def fellegi_sunter_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band linkage report over every blocked candidate pair:
    pair count, integer micro-unit score extremes, and how many pairs
    in the band the deterministic lev<=1 rule would also have matched
    (the agreement between the probabilistic and deterministic
    pipelines, per band).

    Plan: two half-key block joins (bounded blocks by the interleaved-
    entropy argument above, further cut by the nation conjunct), one
    distinct on the scored pair relation, one integer-sum projection,
    one band aggregate — the output is three rows at any scale."""
    customer = load_table(spark, sf_dir, "customer")
    passes = [
        _fs_candidates(customer, _interleaved_key("c_name", pp))
        for pp in _FS_PART_PAIRS
    ]
    pairs = passes[0].union(passes[1]).union(passes[2]).distinct()
    return fs_band_report(pairs)


def _fs_pass_sql(positions: tuple[int, ...]) -> str:
    ka = _interleaved_key_sql("a", positions)
    kb = _interleaved_key_sql("b", positions)
    return f"""
    SELECT a.c_custkey AS src, b.c_custkey AS dst,
           levenshtein(a.c_name, b.c_name) <= {_LEV_MAX} AS ag_name,
           a.c_mktsegment = b.c_mktsegment AS ag_segment,
           a.bb = b.bb AS ag_balance
    FROM fs_cust a JOIN fs_cust b
      ON {ka} = {kb}
     AND a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey"""


def _fs_sql() -> str:
    score = " + ".join(
        f"CASE WHEN ag_{f} THEN {wa} ELSE {wd} END"
        for f, (wa, wd) in sorted(_FS_W.items())
    )
    return f"""
WITH fs_cust AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           round(c_acctbal * 100)::BIGINT // 100000 AS bb
    FROM customer
),
fs_pairs AS (
{_fs_pass_sql(_FS_PART_PAIRS[0])}
    UNION
{_fs_pass_sql(_FS_PART_PAIRS[1])}
    UNION
{_fs_pass_sql(_FS_PART_PAIRS[2])}
),
scored AS (
    SELECT ({score})::BIGINT AS score_micro,
           CASE WHEN ag_name THEN 1 ELSE 0 END AS is_lev_match
    FROM fs_pairs
),
banded AS (
    SELECT CASE WHEN score_micro >= {_FS_T_LINK} THEN '1 link'
                WHEN score_micro >= {_FS_T_POSSIBLE} THEN '2 possible'
                ELSE '3 non-link' END AS band,
           score_micro, is_lev_match
    FROM scored
)
SELECT band,
       count(*)::BIGINT AS n_pairs,
       min(score_micro) AS min_score_micro,
       max(score_micro) AS max_score_micro,
       sum(is_lev_match)::BIGINT AS n_lev_matches
FROM banded
GROUP BY band
ORDER BY band
"""


QUERIES["fellegi_sunter_bands"] = fellegi_sunter_bands
ORACLES["fellegi_sunter_bands"] = _fs_sql()


# --------------------------------------------------------------------------
# EM parameter estimation for Fellegi-Sunter (the r9 verdict's "next"
# #4): replace the fixed published m/u stand-ins above (the `_FS_MU`
# literals) with the standard EM over agreement-vector counts (Winkler
# 1988, "Using the EM algorithm for weight computation in the
# Fellegi-Sunter model"; Jaro 1989). Under conditional independence
# the whole E-step is a function of the 8 agreement PATTERNS, so the
# only distributed work is ONE aggregate that counts pairs per
# pattern; EM then iterates over those 8 cells in the driver — the
# same big-data-once / tiny-fixpoint-after altitude as the G1
# supertype closure.
#
# Engine-exactness: EM runs in INTEGER NANO-UNIT fixed point (1e9 =
# probability 1) with floor division after every multiply, a fixed
# iteration count, and clamping to [1, 1e9-1] — both engines execute
# the identical integer recurrence (Python bigints here; a HUGEINT
# scalar recursive CTE in the DuckDB oracle), so the resulting
# parameters match bit-for-bit with no float anywhere. The fold order
# is part of the spec: the match-side product starts from p and
# multiplies the name, segment, balance terms in that order (the
# non-match side starts from 1-p), flooring after each step.
#
# Estimation-population caveat (standard in blocked linkage): EM runs
# over the BLOCKED candidate pairs, so u_f is P(agree | non-match)
# within blocks — biased upward vs. random pairs for fields correlated
# with the block key (name, here). That is the population the scorer
# actually ranks, so the weights remain internally consistent; a
# random-pair u estimate would need a sampling pass the fixed
# literals above already stand in for.
# --------------------------------------------------------------------------

_FS_EM_ITERS = 12
_FS_ONE = 1_000_000_000  # nano-unit fixed-point scale
# field -> pattern-index bit, in the documented fold order
_FS_FIELDS = (("name", 4), ("segment", 2), ("balance", 1))


def _fs_em_init() -> tuple[int, dict[str, int], dict[str, int]]:
    """Published starting point: p0 = 0.01, m/u from the `_FS_MU`
    stand-ins (nano-units)."""
    p0 = _FS_ONE // 100
    m0 = {f: round(mu[0] * _FS_ONE) for f, mu in _FS_MU.items()}
    u0 = {f: round(mu[1] * _FS_ONE) for f, mu in _FS_MU.items()}
    return p0, m0, u0


def _fs_em(counts: list[int]) -> tuple[int, dict[str, int], dict[str, int]]:
    """`_FS_EM_ITERS` integer-exact EM iterations over the 8
    agreement-pattern counts (pattern g = 4*name + 2*segment +
    1*balance agreement bits)."""
    one = _FS_ONE

    def clamp(x: int) -> int:
        return min(max(x, 1), one - 1)

    p, m, u = _fs_em_init()
    for _ in range(_FS_EM_ITERS):
        s_tot = t_tot = 0
        s_f = {f: 0 for f, _ in _FS_FIELDS}
        t_f = {f: 0 for f, _ in _FS_FIELDS}
        for g, n in enumerate(counts):
            am, au = p, one - p
            for f, b in _FS_FIELDS:
                am = am * (m[f] if g & b else one - m[f]) // one
                au = au * (u[f] if g & b else one - u[f]) // one
            w = am * one // max(am + au, 1)
            s_tot += n * w
            t_tot += n * (one - w)
            for f, b in _FS_FIELDS:
                if g & b:
                    s_f[f] += n * w
                    t_f[f] += n * (one - w)
        n_tot = sum(counts)
        p = clamp(s_tot // max(n_tot, 1))
        m = {f: clamp(s_f[f] * one // max(s_tot, 1)) for f, _ in _FS_FIELDS}
        u = {f: clamp(t_f[f] * one // max(t_tot, 1)) for f, _ in _FS_FIELDS}
    return p, m, u


def _pattern_counts(pairs: DataFrame) -> list[int]:
    """The 8-cell agreement-pattern histogram of a scored candidate
    relation — the ONLY data-sized stage of the EM queries; the 8
    counts come to the driver as a 1-row readout (pinned in
    tests/test_driver_materialization.py)."""
    pattern = (
        F.col("ag_name").cast("int") * 4
        + F.col("ag_segment").cast("int") * 2
        + F.col("ag_balance").cast("int")
    )
    row = pairs.select(pattern.alias("g")).groupBy().agg(
        *[
            F.count(F.when(F.col("g") == g, F.lit(1))).alias(f"n{g}")
            for g in range(8)
        ]
    ).collect()[0]
    return [row[f"n{g}"] for g in range(8)]


def _fs_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three 6-digit block-join passes + distinct — the shared
    candidate relation of every FS query."""
    customer = load_table(spark, sf_dir, "customer")
    passes = [
        _fs_candidates(customer, _interleaved_key("c_name", pp))
        for pp in _FS_PART_PAIRS
    ]
    return passes[0].union(passes[1]).union(passes[2]).distinct()


def fs_em_report(spark: SparkSession, counts: list[int]) -> DataFrame:
    """Run the fixed-iteration integer EM on an 8-cell histogram and
    shape the per-field parameter report (shared by the batch query
    and the streaming twin in ``streaming/fs_linkage.py``)."""
    p, m, u = _fs_em(counts)
    n_pairs = sum(counts)
    out = [
        (f, m[f], u[f], p, n_pairs)
        for f in sorted(f for f, _ in _FS_FIELDS)
    ]
    return local_frame(
        spark,
        out,
        "field string, m_nano long, u_nano long, p_nano long, "
        "n_pairs long",
    ).orderBy("field")


def fs_em_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM-estimated Fellegi-Sunter m/u parameters over the blocked
    candidate pairs (module-note above).

    Plan: the same three 6-digit block-join passes as
    `fellegi_sunter_bands`, one distinct, then ONE 8-cell aggregate
    (the agreement-pattern histogram — the only data-sized stage);
    the 8 counts come to the driver (a 1-row readout, pinned in
    tests/test_driver_materialization.py) and the fixed-iteration
    integer EM runs there. Output: one row per scored field with the
    estimated m/u and the shared match proportion p, all in
    nano-units."""
    return fs_em_report(
        spark, _pattern_counts(_fs_blocked_pairs(spark, sf_dir))
    )


def _fs_em_sql() -> str:
    """The identical fixed-iteration integer EM as a HUGEINT scalar
    recursive CTE over the one-row pattern histogram."""
    one = _FS_ONE
    p0, m0, u0 = _fs_em_init()
    prefix = {"name": "n", "segment": "s", "balance": "b"}

    # per-pattern E-step expressions, mirroring _fs_em's fold order
    def chain(start: str, g: int, par: dict[str, str]) -> str:
        e = start
        for f, b in _FS_FIELDS:
            t = par[f] if g & b else f"({one} - {par[f]})"
            e = f"(({e} * {t}) // {one})"
        return e

    w_cols, s_terms, t_terms = [], [], []
    sf_terms = {f: [] for f, _ in _FS_FIELDS}
    tf_terms = {f: [] for f, _ in _FS_FIELDS}
    mpar = {f: f"m{prefix[f]}" for f, _ in _FS_FIELDS}
    upar = {f: f"u{prefix[f]}" for f, _ in _FS_FIELDS}
    for g in range(8):
        am = chain("p", g, mpar)
        au = chain(f"({one} - p)", g, upar)
        w_cols.append(
            f"(({am} * {one}) // greatest({am} + {au}, 1)) AS w{g}"
        )
        s_terms.append(f"n{g} * w{g}")
        t_terms.append(f"n{g} * ({one} - w{g})")
        for f, b in _FS_FIELDS:
            if g & b:
                sf_terms[f].append(f"n{g} * w{g}")
                tf_terms[f].append(f"n{g} * ({one} - w{g})")

    def clamp(x: str) -> str:
        return f"least(greatest({x}, 1), {one - 1})"

    m_updates = ", ".join(
        clamp(f"(sf_{f} * {one}) // greatest(s_tot, 1)")
        + f" AS {mpar[f]}"
        for f, _ in _FS_FIELDS
    )
    u_updates = ", ".join(
        clamp(f"(tf_{f} * {one}) // greatest(t_tot, 1)")
        + f" AS {upar[f]}"
        for f, _ in _FS_FIELDS
    )
    sf_cols = ", ".join(
        f"{' + '.join(sf_terms[f])} AS sf_{f}" for f, _ in _FS_FIELDS
    )
    tf_cols = ", ".join(
        f"{' + '.join(tf_terms[f])} AS tf_{f}" for f, _ in _FS_FIELDS
    )
    n_filters = ", ".join(
        "count(*) FILTER (WHERE "
        + " AND ".join(
            (f"ag_{f}" if g & b else f"NOT ag_{f}")
            for f, b in _FS_FIELDS
        )
        + f")::HUGEINT AS n{g}"
        for g in range(8)
    )
    init_cols = (
        f"0 AS it, {p0}::HUGEINT AS p, "
        + ", ".join(f"{m0[f]}::HUGEINT AS {mpar[f]}" for f, _ in _FS_FIELDS)
        + ", "
        + ", ".join(f"{u0[f]}::HUGEINT AS {upar[f]}" for f, _ in _FS_FIELDS)
    )
    par_cols = "p, " + ", ".join(
        f"{mpar[f]}, {upar[f]}" for f, _ in _FS_FIELDS
    )
    field_rows = " UNION ALL ".join(
        f"SELECT '{f}' AS field, {mpar[f]}::BIGINT AS m_nano, "
        f"{upar[f]}::BIGINT AS u_nano, p::BIGINT AS p_nano, "
        f"n_tot::BIGINT AS n_pairs FROM final"
        for f in sorted(f for f, _ in _FS_FIELDS)
    )
    return f"""
WITH RECURSIVE fs_cust AS (
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           round(c_acctbal * 100)::BIGINT // 100000 AS bb
    FROM customer
),
fs_pairs AS (
{_fs_pass_sql(_FS_PART_PAIRS[0])}
    UNION
{_fs_pass_sql(_FS_PART_PAIRS[1])}
    UNION
{_fs_pass_sql(_FS_PART_PAIRS[2])}
),
pat AS (
    SELECT {n_filters},
           count(*)::HUGEINT AS n_tot
    FROM fs_pairs
),
em AS (
    SELECT {init_cols}
    UNION ALL
    SELECT it + 1,
           {clamp("s_tot // greatest(n_tot, 1)")} AS p,
           {m_updates},
           {u_updates}
    FROM (
        SELECT it,
               {' + '.join(s_terms)} AS s_tot,
               {' + '.join(t_terms)} AS t_tot,
               {sf_cols},
               {tf_cols},
               n_tot
        FROM (
            SELECT it, {par_cols},
                   n0, n1, n2, n3, n4, n5, n6, n7, n_tot,
                   {", ".join(w_cols)}
            FROM em, pat
            WHERE it < {_FS_EM_ITERS}
        )
    )
),
final AS (
    SELECT * FROM em, pat WHERE it = {_FS_EM_ITERS}
)
{field_rows}
ORDER BY field
"""


QUERIES["fs_em_parameters"] = fs_em_parameters
ORACLES["fs_em_parameters"] = _fs_em_sql()


# --------------------------------------------------------------------------
# EM-weighted banding — the estimation pass actually USED: band every
# candidate pair by its EM-estimated posterior match probability
# P(match | agreement pattern) instead of the fixed-literal LLR score.
#
# Banding on the posterior rather than on ln(m/u) weight sums keeps
# the whole pipeline integer-exact: the posterior for a pattern is the
# E-step expression w_g the EM already evaluates in nano-unit fixed
# point, so no logarithm (a float op whose last-ulp disagreement
# across engines could flip a pair at a band cliff) ever enters. With
# p fixed at its EM estimate the posterior is a strictly monotone
# function of the LLR, so the banding semantics are Fellegi-Sunter's —
# only the threshold parameterization changes (posterior cliffs at
# 0.9 / 0.1 instead of ln-odds cliffs at 2 / -1).
#
# There are only 8 agreement patterns, so the plan is: the one 8-cell
# pattern aggregate (the only data-sized stage, shared with
# fs_em_parameters) -> EM + per-pattern posteriors in the driver ->
# band the PATTERN HISTOGRAM, not the pairs: the per-band report is a
# weighted rollup of at most 8 rows. Nothing after the aggregate
# touches data.
# --------------------------------------------------------------------------

_FS_POST_LINK = 900_000_000  # posterior >= 0.9 -> link
_FS_POST_POSSIBLE = 100_000_000  # posterior >= 0.1 -> possible


def _fs_posteriors(
    counts: list[int],
) -> tuple[list[int], int, dict[str, int], dict[str, int]]:
    """Per-pattern nano-unit posteriors under the EM-estimated
    parameters (one extra E-step on the converged values — the same
    integer expressions as inside `_fs_em`)."""
    one = _FS_ONE
    p, m, u = _fs_em(counts)
    posts = []
    for g in range(8):
        am, au = p, one - p
        for f, b in _FS_FIELDS:
            am = am * (m[f] if g & b else one - m[f]) // one
            au = au * (u[f] if g & b else one - u[f]) // one
        posts.append(am * one // max(am + au, 1))
    return posts, p, m, u


def fs_em_posterior_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band the blocked candidate pairs by EM-estimated posterior
    match probability (module-note above): per band, the pair count,
    nano-unit posterior extremes, and how many pairs the deterministic
    lev<=1 rule would also have matched."""
    counts = _pattern_counts(_fs_blocked_pairs(spark, sf_dir))
    posts, _p, _m, _u = _fs_posteriors(counts)

    def band(g: int) -> str:
        if posts[g] >= _FS_POST_LINK:
            return "1 link"
        if posts[g] >= _FS_POST_POSSIBLE:
            return "2 possible"
        return "3 non-link"

    rollup: dict[str, list[int]] = {}
    for g in range(8):
        if counts[g] == 0:
            continue
        r = rollup.setdefault(band(g), [0, posts[g], posts[g], 0])
        r[0] += counts[g]
        r[1] = min(r[1], posts[g])
        r[2] = max(r[2], posts[g])
        if g & 4:  # name agreement = the deterministic lev<=1 rule
            r[3] += counts[g]
    out = [
        (b, r[0], r[1], r[2], r[3]) for b, r in sorted(rollup.items())
    ]
    return local_frame(
        spark,
        out,
        "band string, n_pairs long, min_posterior_nano long, "
        "max_posterior_nano long, n_lev_matches long",
    ).orderBy("band")


def _fs_posterior_sql() -> str:
    """The identical EM + posterior banding in SQL: reuse the EM
    recursive CTE, add one more E-step on the converged row, band the
    8-row pattern histogram."""
    one = _FS_ONE
    em_sql = _fs_em_sql()
    # reuse everything up to (and including) the `final` CTE
    head, _tail = em_sql.rsplit("\n)\n", 1)
    prefix = {"name": "n", "segment": "s", "balance": "b"}
    mpar = {f: f"m{prefix[f]}" for f, _ in _FS_FIELDS}
    upar = {f: f"u{prefix[f]}" for f, _ in _FS_FIELDS}

    def chain(start: str, g: int, par: dict[str, str]) -> str:
        e = start
        for f, b in _FS_FIELDS:
            t = par[f] if g & b else f"({one} - {par[f]})"
            e = f"(({e} * {t}) // {one})"
        return e

    pattern_rows = " UNION ALL ".join(
        f"SELECT {g} AS g, n{g} AS n, "
        + chain("p", g, mpar)
        + " * "
        + str(one)
        + " // greatest("
        + chain("p", g, mpar)
        + " + "
        + chain(f"({one} - p)", g, upar)
        + ", 1) AS post FROM final"
        for g in range(8)
    )
    return f"""{head}
),
pattern_posts AS (
{pattern_rows}
),
pattern_bands AS (
    SELECT CASE WHEN post >= {_FS_POST_LINK} THEN '1 link'
                WHEN post >= {_FS_POST_POSSIBLE} THEN '2 possible'
                ELSE '3 non-link' END AS band,
           n, post,
           CASE WHEN g >= 4 THEN n ELSE 0 END AS n_lev
    FROM pattern_posts
    WHERE n > 0
)
SELECT band,
       sum(n)::BIGINT AS n_pairs,
       min(post)::BIGINT AS min_posterior_nano,
       max(post)::BIGINT AS max_posterior_nano,
       sum(n_lev)::BIGINT AS n_lev_matches
FROM pattern_bands
GROUP BY band
ORDER BY band
"""


QUERIES["fs_em_posterior_bands"] = fs_em_posterior_bands
ORACLES["fs_em_posterior_bands"] = _fs_posterior_sql()


# --------------------------------------------------------------------------
# Golden-record survivorship — the MDM terminal operation: after
# clustering, each duplicate cluster collapses to ONE canonical
# ("golden") record by field-wise survivorship rules (the
# merge/survivorship stage every master-data pipeline ends with;
# cf. the survivorship taxonomies in Talburt & Zhou, "Entity
# Information Life Cycle for Big Data", 2015). Rules here, all
# deterministic and engine-exact:
#
# - identity:   the component id (min member id);
# - name:       the name of the member with the HIGHEST account
#               balance (most-trusted-source stand-in), ties broken
#               by lowest custkey — a row_number over a total order;
# - segment:    the cluster MODE, ties broken lexicographically;
# - nation:     inherited from the name survivor (all members share
#               it anyway — nation is a blocking conjunct);
# - balance:    the maximum across members (greatest-value rule).
#
# Plan: the shared match graph -> connected components (pair-graph
# sized, never base-table sized) -> ONE join back to the customer
# attributes -> two component-partitioned windows (cluster-sized
# partitions) + one aggregate. Output bounded by _REPORT_CAP.
# --------------------------------------------------------------------------


def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One canonical record per duplicate cluster (module-note above):
    the ``_REPORT_CAP`` largest clusters with their survivor fields."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    labels = connected_components(_deterministic_pairs(customer))
    members = labels.join(
        customer, labels.node == customer.c_custkey
    ).select(
        "component_id",
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        "c_acctbal",
    )
    w_name = Window.partitionBy("component_id").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    survivor = (
        members.withColumn("rn", F.row_number().over(w_name))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("c_name").alias("golden_name"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    seg_counts = members.groupBy("component_id", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_seg = Window.partitionBy("component_id").orderBy(
        F.desc("cnt"), F.asc("c_mktsegment")
    )
    seg_mode = (
        seg_counts.withColumn("rn", F.row_number().over(w_seg))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("c_mktsegment").alias("golden_segment"),
        )
    )
    agg = members.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )
    return (
        agg.join(survivor, "component_id")
        .join(seg_mode, "component_id")
        .select(
            "component_id",
            "n_members",
            "golden_name",
            "golden_segment",
            "nationkey",
            "max_acctbal",
        )
        .orderBy(F.desc("n_members"), "component_id")
        .limit(_REPORT_CAP)
    )


GOLDEN_RECORD_SQL = f"""{_LABELED_CTE_SQL},
members AS (
    SELECT l.component_id, c.c_custkey, c.c_name, c.c_nationkey,
           c.c_mktsegment, c.c_acctbal
    FROM labeled l JOIN customer c ON l.node = c.c_custkey
),
named AS (
    SELECT component_id, c_name, c_nationkey,
           row_number() OVER (PARTITION BY component_id
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM members
),
segm AS (
    SELECT component_id, c_mktsegment, count(*) AS cnt
    FROM members GROUP BY 1, 2
),
segp AS (
    SELECT component_id, c_mktsegment,
           row_number() OVER (PARTITION BY component_id
                              ORDER BY cnt DESC, c_mktsegment ASC) AS rn
    FROM segm
),
agg AS (
    SELECT component_id, count(*) AS n_members,
           round(max(c_acctbal), 2) AS max_acctbal
    FROM members GROUP BY 1
)
SELECT a.component_id,
       a.n_members,
       n.c_name AS golden_name,
       s.c_mktsegment AS golden_segment,
       n.c_nationkey AS nationkey,
       a.max_acctbal
FROM agg a
JOIN named n ON a.component_id = n.component_id AND n.rn = 1
JOIN segp s ON a.component_id = s.component_id AND s.rn = 1
ORDER BY a.n_members DESC, a.component_id
LIMIT {_REPORT_CAP}
"""

QUERIES["golden_record_survivorship"] = golden_record_survivorship
ORACLES["golden_record_survivorship"] = GOLDEN_RECORD_SQL
