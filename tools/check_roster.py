"""Roster-identity gate (round-5 verdict item #8).

The `len(queries()) <= 50` pin in tests/test_registry.py covers COUNT, not
IDENTITY — the r4 silent-drop failure class was three registered queries
that never reached the driver artifact. This script closes that hole: run
it each round (and before committing roster changes) to diff
``set(queries())`` against the latest ``CORRECTNESS_r*.json`` on disk.

Exit 1 on structural violations (roster > 50, a query missing its oracle
without being a documented no-oracle entry, an oracle without a query).
Identity drift vs the latest driver artifact is PRINTED, not failed — at
round start a deliberate swap (e.g. r5's m3b_pairwise_rank →
dedup_substring) shows up here as exactly one add + one drop, which is the
auditable trail the verdict asked for.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# queries whose semantics are documented as non-SQL-expressible (driver
# records a weaker rows-only check); everything else MUST carry an oracle
NO_ORACLE_OK: set[str] = set()


def main() -> int:
    import __spark_entry__ as entry

    q = set(entry.queries())
    o = set(entry.oracle_sql())
    rc = 0
    print(f"queries: {len(q)}  oracles: {len(o)}")
    if len(q) > 50:
        print(f"FAIL: roster exceeds the 50-entry cap ({len(q)})")
        rc = 1
    missing_oracle = q - o - NO_ORACLE_OK
    if missing_oracle:
        print(f"FAIL: queries without an oracle: {sorted(missing_oracle)}")
        rc = 1
    orphan_oracle = o - q
    if orphan_oracle:
        print(f"FAIL: oracles without a query: {sorted(orphan_oracle)}")
        rc = 1

    arts = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if not arts:
        print("no CORRECTNESS_r*.json artifact found — identity diff skipped")
        return rc
    latest = arts[-1]
    prev = set(json.load(open(latest)))
    added, dropped = sorted(q - prev), sorted(prev - q)
    print(f"vs {os.path.basename(latest)}: "
          f"+{added or 'none'} / -{dropped or 'none'}")
    if added or dropped:
        print("  (deliberate swaps must be one-for-one and noted in "
              "SURVEY.md / BENCH/BASELINE.md)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
