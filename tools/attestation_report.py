"""Attestation-freshness report — the data the post-debt STABLE
surface policy (COVERAGE.md) selects on.

For every registered query: which rounds hold a green driver row
(rows + schema [+ hash]), the newest such round, and whether it is on
the current declared surface. The displacement order the policy's
rule 2 uses ("most redundantly attested out first") is the sort at the
bottom: most distinct green rounds, ties broken by most recent round.

Usage:  python tools/attestation_report.py [--candidates N]
  --candidates N   also print the N declared rows the policy would
                   displace first when newcomers need slots.
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

# §2-critical rows the policy's rule 1 never displaces while declared.
STABLE_ALWAYS = {
    "stream_determine_change",
    "stream_synchronize_docstore",
    "stream_publish_state",
    "stream_dead_letter_box",
}


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, rec in json.load(open(path)).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
            ):
                rounds.setdefault(name, []).append(rnum)

    registered = sorted(set(all_queries()) | set(extra_queries()))
    declared = set(DRIVER_QUERIES)
    never = [n for n in registered if n not in rounds]

    print(f"registered: {len(registered)}  declared: {len(declared)}  "
          f"ever-attested: {len(registered) - len(never)}  "
          f"never-attested: {len(never)}")
    if never:
        print("never-attested:")
        for n in never:
            mark = "DECLARED" if n in declared else "  (waits for next surface)"
            print(f"  {n}  {mark}")

    n_candidates = 0
    if "--candidates" in sys.argv:
        n_candidates = int(sys.argv[sys.argv.index("--candidates") + 1])
    if n_candidates:
        cands = sorted(
            (
                n
                for n in declared
                if n in rounds and n not in STABLE_ALWAYS
            ),
            key=lambda n: (-len(set(rounds[n])), -max(rounds[n]), n),
        )
        print(f"\ndisplacement order (policy rule 2), first {n_candidates}:")
        for n in cands[:n_candidates]:
            rs = sorted(set(rounds[n]))
            print(f"  {n}  green-rounds={rs}")


if __name__ == "__main__":
    main()
