"""Per-query bench regression guard (round-4 verdict task 7): committed
bench recordings must stay within a ceiling of the recorded round-4
baseline, so suite-level drift fails loudly in `pytest` instead of
surfacing as a judge diff next round.

The guard compares COMMITTED artifacts (pure JSON, no Spark session): the
newest full sf0.1 recording in bench_results/ against the r4e baseline,
and every sf1-derived recording against its sf0.1 sibling via
scripts/scale_smoke.check. Ceiling = 1.5x + 0.5 s absolute slack — sized
to the measured host variance (bench_results/DRIFT_NOTE_r5.md: identical
plans vary up to ~1.4x quiet-to-quiet on this shared box)."""

from __future__ import annotations

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BASELINE = os.path.join(REPO, "bench_results", "bench_sf0.1_r4e.json")

CEILING_RATIO = 1.5
CEILING_SLACK = 0.5  # seconds — absorbs sub-second jitter on fast queries


def _full_sf01_artifacts():
    out = []
    for p in glob.glob(os.path.join(REPO, "bench_results", "bench_sf0.1_*.json")):
        try:
            d = json.load(open(p))
        except Exception:
            continue
        if isinstance(d, dict) and "queries" in d:
            out.append((p, d))
    return out


def _recency_key(path: str, rec: dict) -> tuple:
    """Newest-recording order that survives a fresh clone (ADVICE r5: file
    mtime is just checkout order): recordings carry an embedded
    ``recorded_unix`` since round 6; older artifacts order by the round id
    in their filename (r4 < r4b < ... < r5d), numerically on the round."""
    import re

    m = re.search(r"_r(\d+)([a-z]*)", os.path.basename(path))
    round_key = (int(m.group(1)), m.group(2)) if m else (0, "")
    return (rec.get("recorded_unix", 0), round_key)


def test_latest_sf01_recording_within_ceiling():
    base = json.load(open(BASELINE))
    arts = _full_sf01_artifacts()
    assert arts, "no committed sf0.1 bench artifacts"
    # newest by mtime, excluding the baseline itself; subset recordings
    # (SPARK_GRAFT_BENCH_ONLY) guard only the queries they cover
    newer = [(p, d) for p, d in arts if os.path.abspath(p) != os.path.abspath(BASELINE)]
    if not newer:
        pytest.skip("only the baseline recording exists")
    path, rec = max(newer, key=lambda t: _recency_key(t[0], t[1]))
    over = []
    for q, t in rec["queries"].items():
        b = base["queries"].get(q)
        if b is None:
            continue  # new query — no recorded baseline yet
        if t > CEILING_RATIO * b + CEILING_SLACK:
            over.append((q, b, t, round(t / max(b, 1e-9), 2)))
    assert not over, (
        f"{os.path.basename(path)} regressed past {CEILING_RATIO}x+{CEILING_SLACK}s "
        f"of the r4e baseline: {sorted(over, key=lambda x: -x[3])[:10]}"
    )


def test_sf1_derived_recordings_scale_linearly():
    """Every committed sf1-derived recording must pass scale_smoke.check
    against the r4e sf0.1 baseline (<=10x for 10x data, modulo the declared
    supra-linear exceptions)."""
    from scripts.scale_smoke import check

    sf1s = sorted(glob.glob(os.path.join(REPO, "bench_results", "bench_sf1_derived_*.json")))
    if not sf1s:
        pytest.skip("no sf1-derived recordings committed")
    def _key(p):
        try:
            return _recency_key(p, json.load(open(p)))
        except Exception:
            return (0, (0, ""))

    newest = max(sf1s, key=_key)
    assert check(BASELINE, newest, 10.0) == 0, f"{os.path.basename(newest)} failed scale check"
