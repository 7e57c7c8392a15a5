"""Attestation-freshness report — the data the post-debt STABLE
surface policy (COVERAGE.md) selects on, now POLICY-AWARE.

For every registered query: which rounds hold a green driver row
(rows + schema [+ hash]), the newest such round, and whether it is on
the current declared surface. The policy itself lives as data in
``m4i_flink_tasks_spark/queries/surface_policy.py``; this tool
evaluates it against the recorded CORRECTNESS files:

* partitions the declared surface into PROTECTED rows (rule 1: the
  §2-critical streaming proofs + any row that is its family's only
  declared member) vs DISPLACEABLE rows, and emits rule 2's
  displacement order only over the displaceable set — following the
  output verbatim can never displace a protected row;
* flags §2 families whose newest attestation triggers rule 3's
  staleness backstop at the NEXT round.

Usage:  python tools/attestation_report.py [--candidates N]
  --candidates N   also print the N displaceable declared rows the
                   policy would displace first when newcomers need
                   slots.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m4i_flink_tasks_spark.queries import (  # noqa: E402
    DRIVER_QUERIES,
    all_queries,
    extra_queries,
)
from m4i_flink_tasks_spark.queries.surface_policy import (  # noqa: E402
    SECTION2_FAMILIES,
    STALE_AFTER_ROUNDS,
    family_green_rounds,
    protected_rows,
    stale_families,
)


def load_green_rounds(root: str) -> tuple[dict[str, list[int]], int]:
    """Green driver rows per query from the recorded CORRECTNESS
    files; also the latest recorded round number."""
    rounds: dict[str, list[int]] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"_r(\d+)\.json$", path).group(1))
        latest = max(latest, rnum)
        for name, rec in json.load(open(path)).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
            ):
                rounds.setdefault(name, []).append(rnum)
    return rounds, latest


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds, latest = load_green_rounds(root)
    next_round = latest + 1

    registered = sorted(set(all_queries()) | set(extra_queries()))
    declared = tuple(DRIVER_QUERIES)
    declared_set = set(declared)
    never = [n for n in registered if n not in rounds]

    print(f"registered: {len(registered)}  declared: {len(declared)}  "
          f"ever-attested: {len(registered) - len(never)}  "
          f"never-attested: {len(never)}")
    if never:
        print("never-attested:")
        for n in never:
            mark = "DECLARED" if n in declared_set else "  (waits for next surface)"
            print(f"  {n}  {mark}")

    protected = protected_rows(declared, rounds, next_round)
    print(f"\nprotected (rule 1 — never displaced): {len(protected)}")
    for n in sorted(protected):
        rs = sorted(set(rounds.get(n, [])))
        print(f"  {n}  green-rounds={rs}")

    stale = stale_families(rounds, next_round)
    print(f"\nstaleness backstop (rule 3) at r{next_round} "
          f"(threshold {STALE_AFTER_ROUNDS} rounds):")
    if not stale:
        print("  no §2 family stale — every family's newest driver row is "
              f"<= {STALE_AFTER_ROUNDS} rounds old")
    for fam, newest in sorted(stale.items()):
        members = SECTION2_FAMILIES[fam]
        on_surface = sorted(set(members) & declared_set)
        fam_rounds = family_green_rounds(rounds, members)
        print(f"  {fam}: newest green r{newest} "
              f"(family rounds {fam_rounds}) — rule 3 FIRES; "
              f"declared members now: {on_surface or 'NONE — must add one'}")

    n_candidates = 0
    if "--candidates" in sys.argv:
        # bare --candidates (no count) defaults to 10
        idx = sys.argv.index("--candidates") + 1
        n_candidates = (
            int(sys.argv[idx])
            if idx < len(sys.argv) and sys.argv[idx].isdigit()
            else 10
        )
    if n_candidates:
        cands = sorted(
            (
                n
                for n in declared_set
                if n in rounds and n not in protected
            ),
            key=lambda n: (-len(set(rounds[n])), -max(rounds[n]), n),
        )
        print(f"\ndisplacement order (rule 2, displaceable rows only), "
              f"first {n_candidates}:")
        for n in cands[:n_candidates]:
            rs = sorted(set(rounds[n]))
            print(f"  {n}  green-rounds={rs}")


if __name__ == "__main__":
    main()
