"""Compute the next driver-window rotation.

The driver's CORRECTNESS gate verifies the FIRST 50 entries of
``queries()`` (see registry.py). This tool diffs the registry against
every committed CORRECTNESS_r*.json and prints the queries that still
lack a driver row, in registration order — the candidate pool for the
next round's ``_DRIVER_WINDOW`` list. Run at the start of each round:

    python tools/next_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())
    checked: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        d = json.load(open(f))
        green = {k for k, v in d.items()
                 if v.get("hash_match") or v.get("err") == "no_oracle"}
        checked |= green
        print(f"{os.path.basename(f)}: {len(d)} rows, {len(green)} green")
    unchecked = [q for q in qs if q not in checked]
    print(f"\nregistry: {len(qs)} queries; driver-green so far: "
          f"{len(checked & set(qs))}; still unchecked: {len(unchecked)}")
    print("\nnext-window candidates (registration order; * = rows-only,"
          " no oracle):")
    for q in unchecked:
        mark = "" if q in oracles else " *"
        print(f"  {q}{mark}")

    # Certification-age ledger: once every row has SOME driver cert
    # (round 9+), rotation targets the OLDEST ones. Latest green round
    # per query, grouped oldest-first — the candidate pool in priority
    # order (anything rewritten in the current round still outranks
    # these re-certs).
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        d = json.load(open(f))
        for k, v in d.items():
            if v.get("err") is None and v.get("rows_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    by_round: dict[int, list[str]] = {}
    for q in qs:
        if q in latest:
            by_round.setdefault(latest[q], []).append(q)
    print("\ncertification age (latest green driver round -> rows):")
    for rnd in sorted(by_round):
        rows = by_round[rnd]
        print(f"  r{rnd}: {len(rows)} rows")
        print("    " + " ".join(sorted(rows)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
