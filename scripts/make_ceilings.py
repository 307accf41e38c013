"""Maintain bench_results/ceilings.json — the per-query regression-ceiling
base table (round-7 verdict task 3).

Policy: a query's ceiling base is the MINIMUM timing across committed
full recordings — r4e where the query existed then, tightened by any
newer faster recording. Re-running this script therefore never loosens an
existing ceiling (loosening requires a documented `rebased` entry, see
test_ceiling_bases_never_loosened); it appends entries for queries that
have none yet (new operators must ship with a bench recording, or the
guard's coverage test fails) and tightens where the code got faster.

Usage:
    python scripts/make_ceilings.py bench_results/bench_sf0.1_r8.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CEILINGS = os.path.join(REPO, "bench_results", "ceilings.json")
R4E = os.path.join(REPO, "bench_results", "bench_sf0.1_r4e.json")


def main(recording_path: str) -> None:
    rec = json.load(open(recording_path))
    assert rec.get("queries"), f"{recording_path}: no queries"
    if os.path.exists(CEILINGS):
        doc = json.load(open(CEILINGS))
    else:
        base = json.load(open(R4E))["queries"]
        doc = {
            "comment": (
                "per-query ceiling bases (seconds at sf0.1); guard ceiling "
                "= 1.5x + 0.5s. Entries are append-only: oldest committed "
                "full recording wins (r4e where present)."
            ),
            "sources": {"bench_sf0.1_r4e.json": sorted(base)},
            "ceilings": dict(base),
        }
    added, tightened = [], []
    for q, t in rec["queries"].items():
        if q not in doc["ceilings"]:
            doc["ceilings"][q] = t
            added.append(q)
        elif t < doc["ceilings"][q]:
            doc["ceilings"][q] = t
            tightened.append(q)
    if added or tightened:
        doc["sources"][os.path.basename(recording_path)] = sorted(added + tightened)
    with open(CEILINGS, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"ceilings: {len(doc['ceilings'])} entries "
        f"(+{len(added)} new, {len(tightened)} tightened)"
    )


if __name__ == "__main__":
    main(sys.argv[1])
