"""Latest-driver-row vintage per registry entry.

The judge recomputes, every round, which CORRECTNESS_r{N}.json holds the
freshest driver-issued row for each registry query. This script makes that
one command so window rotation stays honest and cheap:

    python tools/vintage_report.py            # histogram + stalest list
    python tools/vintage_report.py --all      # every query with its round
    python tools/vintage_report.py --never    # only never-driver-checked

A query's vintage is the HIGHEST round whose artifact contains it (the
driver re-issues rows only for the 50-entry window, so presence == checked
that round). Queries absent from every artifact are "never driver-checked".
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_vintages() -> dict[str, int]:
    vintages: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name in rows:
            vintages[name] = max(vintages.get(name, 0), rnd)
    return vintages


def registry_order() -> list[str]:
    sys.path.insert(0, REPO)
    from bangumi_notion_data_integration_project_spark.queries import QUERIES

    return list(QUERIES)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="print every query")
    ap.add_argument("--never", action="store_true", help="never-checked only")
    args = ap.parse_args()

    vintages = load_vintages()
    names = registry_order()

    hist: dict[int, int] = {}
    never: list[str] = []
    for name in names:
        if name in vintages:
            hist[vintages[name]] = hist.get(vintages[name], 0) + 1
        else:
            never.append(name)

    print(f"registry: {len(names)} queries")
    for rnd in sorted(hist, reverse=True):
        print(f"  latest row r{rnd}: {hist[rnd]}")
    print(f"  never driver-checked: {len(never)}")

    if args.never or never:
        print("\nnever driver-checked (registry position):")
        for name in never:
            print(f"  {names.index(name) + 1:4d}  {name}")

    if args.all:
        print("\nper-query vintage (registry order):")
        for i, name in enumerate(names, 1):
            v = vintages.get(name)
            print(f"  {i:4d}  {'r%d' % v if v else '----'}  {name}")
    else:
        # stalest first: the rotation shortlist
        checked = [(vintages[n], n) for n in names if n in vintages]
        checked.sort(key=lambda t: (t[0], names.index(t[1])))
        min_v = checked[0][0] if checked else None
        if min_v is not None:
            stale = [n for v, n in checked if v <= min_v + 1]
            print(f"\nstalest (r{min_v}..r{min_v + 1}), registry order preserved:")
            for name in stale:
                print(f"  r{vintages[name]}  {name}")


if __name__ == "__main__":
    main()
