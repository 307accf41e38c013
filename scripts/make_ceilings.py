"""Maintain bench_results/ceilings.json — the per-query regression-ceiling
base table (round-7 verdict task 3; variance-robust policy round 8).

Policy: a query's ceiling base is recomputed from ALL committed full sf0.1
recordings as

    base = max( min(times),  max((t - SLACK)/RATIO for t in times) )

i.e. the minimum observed time (new fast code tightens the bar), but never
so tight that the resulting ceiling (RATIO*base + SLACK) would flag a
committed same-code measurement — round 8 showed a single warm outlier
(dedup_minhash_corpus 2.82 s in one suite run vs 3.9-4.7 s in its
neighbors) can otherwise tighten a ceiling below the query's own measured
variance. Bases never rise above their r4e value where one exists
(test_ceiling_bases_never_loosened); documented `rebased` entries override
as before.

Usage:
    python scripts/make_ceilings.py bench_results/bench_sf0.1_r8f.json
"""

from __future__ import annotations

import glob
import math
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CEILINGS = os.path.join(REPO, "bench_results", "ceilings.json")
R4E = os.path.join(REPO, "bench_results", "bench_sf0.1_r4e.json")

RATIO = 1.5
SLACK = 0.5  # keep in sync with tests/test_bench_guard.py


def _full_recordings(extra_path: str) -> list[dict]:
    paths = set(glob.glob(os.path.join(REPO, "bench_results", "bench_sf0.1_*.json")))
    paths.add(os.path.abspath(extra_path))
    out = []
    for p in sorted(paths):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        if isinstance(d, dict) and d.get("queries") and d.get("full", True):
            out.append(d)
    return out


def main(recording_path: str) -> None:
    rec = json.load(open(recording_path))
    assert rec.get("queries"), f"{recording_path}: no queries"
    recs = _full_recordings(recording_path)
    r4e = json.load(open(R4E))["queries"]
    if os.path.exists(CEILINGS):
        doc = json.load(open(CEILINGS))
    else:
        doc = {
            "sources": {"bench_sf0.1_r4e.json": sorted(r4e)},
            "ceilings": dict(r4e),
        }
    doc["comment"] = (
        "per-query ceiling bases (seconds at sf0.1); guard ceiling = "
        f"{RATIO}x + {SLACK}s. base = max(min observed, tightest base whose "
        "ceiling covers every committed full recording), never above the "
        "query's FIRST-recorded base (first_bases, append-only; r4e value "
        "where one exists); loosening past that requires a documented "
        "`rebased` entry."
    )
    # first_bases: append-only record of each query's first-recorded base —
    # the variance-raise branch clamps to it so a regression committed
    # alongside a full recording can't quietly raise its own bar (round-8
    # ADVICE: the r4e clamp only protected r4e-era queries). Bootstrap
    # from r4e + the bases already stored for post-r4 queries.
    # calibration_base: the FASTEST fixed-workload calibration any
    # committed recording achieved — the reference the guard's drift
    # normalizer divides against (tightens monotonically, never loosens)
    cals = [
        r["calibration_sec"] for r in recs if r.get("calibration_sec")
    ]
    if cals:
        prev = doc.get("calibration_base")
        doc["calibration_base"] = min([*cals, prev] if prev else cals)
    first = doc.setdefault("first_bases", {})
    for q, b in r4e.items():
        first.setdefault(q, b)
    for q, b in doc["ceilings"].items():
        first.setdefault(q, b)
    added, tightened, relaxed = [], [], []
    for q in rec["queries"]:
        times = [r["queries"][q] for r in recs if q in r["queries"]]
        cover = max((t - SLACK) / RATIO for t in times) + 1e-9
        base = max(min(times), cover)
        if q in first:
            base = min(base, first[q])
        # round UP at 3 decimals: banker's rounding of a cover-derived base
        # can land 0.5 ms below what the committed measurement needs and
        # arm a false-positive ceiling (observed: 1.987 s needs 0.99134,
        # round() stored 0.991 -> ceiling 1.9865 < 1.987). The 1e-9 slack
        # keeps an already-3-decimal base from ceiling UP on float dust
        # (2.019*1000 == 2019.0000000000002 would otherwise become 2.02 and
        # trip the never-loosened contract)
        base = math.ceil(base * 1000 - 1e-9) / 1000
        old = doc["ceilings"].get(q)
        if old is None:
            doc["ceilings"][q] = base
            first.setdefault(q, base)
            added.append(q)
        elif base < old:
            doc["ceilings"][q] = base
            tightened.append(q)
        elif base > old:
            # variance-cover raise — capped at the r4e value by the clamp
            # above, so the never-loosened contract holds
            doc["ceilings"][q] = base
            relaxed.append(q)
    if added or tightened or relaxed:
        doc["sources"][os.path.basename(recording_path)] = sorted(
            added + tightened + relaxed
        )
    with open(CEILINGS, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        f"ceilings: {len(doc['ceilings'])} entries (+{len(added)} new, "
        f"{len(tightened)} tightened, {len(relaxed)} variance-raised: {relaxed})"
    )


if __name__ == "__main__":
    main(sys.argv[1])
