"""Per-query bench regression guard (round-4 task 7, widened round 8).

Round 7's gap: the guard only ceilinged queries present in the r4e
baseline, silently skipping ~90 newer queries — exactly where round 6's
unmeasured regression hid. Now every registry query must have a ceiling
base in bench_results/ceilings.json (append-only, oldest-recording-wins —
scripts/make_ceilings.py), the newest FULL sf0.1 recording must cover the
whole registry (a stale bench fails loudly), and every covered timing must
stay within ceiling.

The guard compares COMMITTED artifacts (pure JSON, no Spark session).
Ceiling = 1.5x + 0.5 s absolute slack — sized to the measured host
variance (bench_results/DRIFT_NOTE_r5.md: identical plans vary up to ~1.4x
quiet-to-quiet on this shared box)."""

from __future__ import annotations

import glob
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CEILINGS = os.path.join(REPO, "bench_results", "ceilings.json")
R4E = os.path.join(REPO, "bench_results", "bench_sf0.1_r4e.json")

CEILING_RATIO = 1.5
CEILING_SLACK = 0.5  # seconds — absorbs sub-second jitter on fast queries


def _ceilings_doc() -> dict:
    return json.load(open(CEILINGS))


def _ceilings() -> dict[str, float]:
    """Effective ceiling bases: append-only bases overridden by the LOUD
    documented rebases (host-drift cases listed in DRIFT_NOTE_r8.md —
    test_ceiling_bases_never_loosened enforces the documentation)."""
    doc = _ceilings_doc()
    out = dict(doc["ceilings"])
    for q, info in doc.get("rebased", {}).items():
        out[q] = info["base"]
    return out


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


def _newest_full_recording():
    arts = _full_sf01_artifacts()
    assert arts, "no committed sf0.1 bench artifacts"
    # pre-r8 artifacts lack the "full" flag but were always full runs
    full = [(p, d) for p, d in arts if d.get("full", True)]
    assert full, "no committed FULL sf0.1 bench recording"
    return max(full, key=lambda t: _recency_key(t[0], t[1]))


def test_every_registry_query_has_a_ceiling():
    """Adding a queries() entry without recording a bench for it (and
    appending its ceiling via scripts/make_ceilings.py) fails here — the
    round-6/7 pattern of operators shipping with no regression ceiling."""
    import bench

    ceil = _ceilings()
    missing = [q for q in bench.HEADLINE if q not in ceil]
    assert not missing, (
        f"registry queries without a ceiling base (run the full bench and "
        f"scripts/make_ceilings.py): {missing}"
    )


def test_newest_full_recording_covers_registry():
    """The stale-bench failure mode of round 7: a registry that grew after
    the last full recording. The newest committed full recording must time
    every current registry query."""
    import bench

    path, rec = _newest_full_recording()
    missing = [q for q in bench.HEADLINE if q not in rec["queries"]]
    assert not missing, (
        f"{os.path.basename(path)} does not cover the current registry — "
        f"re-record the full sf0.1 bench; missing: {missing}"
    )


MAX_DRIFT_FACTOR = 2.0  # a slower host loosens ceilings at most this much


def _drift_factor(rec: dict) -> float:
    """Host-drift normalizer (round-8 verdict item 6): the recording's
    fixed synthetic calibration wall over the fastest calibration any
    committed recording achieved. Same code on a slower shared-box session
    inflates both proportionally, so ceilings scale by the ratio instead
    of spending loud `rebased` entries on host drift. Clamped to
    [1, MAX_DRIFT_FACTOR] — drift can never TIGHTEN a ceiling and can
    never excuse a >2x regression. Recordings predating the calibration
    field get factor 1."""
    cal = rec.get("calibration_sec")
    base = _ceilings_doc().get("calibration_base")
    if not cal or not base:
        return 1.0
    return min(MAX_DRIFT_FACTOR, max(1.0, cal / base))


def test_latest_sf01_recording_within_ceiling():
    ceil = _ceilings()
    path, rec = _newest_full_recording()
    drift = _drift_factor(rec)
    over = []
    for q, t in rec["queries"].items():
        b = ceil.get(q)
        if b is None:
            continue  # coverage test above handles unknown queries
        if t > drift * CEILING_RATIO * b + CEILING_SLACK:
            over.append((q, b, t, round(t / max(b, 1e-9), 2)))
    assert not over, (
        f"{os.path.basename(path)} regressed past drift({drift:.2f}x)*"
        f"{CEILING_RATIO}x+{CEILING_SLACK}s of its ceiling base: "
        f"{sorted(over, key=lambda x: -x[3])[:10]}"
    )


def test_ceiling_bases_never_loosened():
    """ceilings.json is append-only: every query the r4e baseline recorded
    must keep its r4e base (regenerating the file cannot quietly raise the
    bar a regression hides under). The ONLY escape is a loud rebase: an
    entry in the `rebased` section carrying a substantive reason AND a
    mention in a committed DRIFT_NOTE — silent loosening stays impossible."""
    doc = _ceilings_doc()
    r4e = json.load(open(R4E))["queries"]
    base = doc["ceilings"]
    loosened = {
        q: (b, base.get(q))
        for q, b in r4e.items()
        if base.get(q) is None or base[q] > b
    }
    assert not loosened, f"r4e ceiling bases loosened/removed: {loosened}"
    notes = " ".join(
        open(p).read()
        for p in glob.glob(os.path.join(REPO, "bench_results", "DRIFT_NOTE_*.md"))
    )
    for q, info in doc.get("rebased", {}).items():
        assert len(info.get("reason", "")) >= 40, f"rebase of {q} lacks a reason"
        assert q in notes, f"rebase of {q} not documented in any DRIFT_NOTE_*.md"
    # post-r4 queries: the variance-raise branch may never lift a base
    # above the query's FIRST-recorded base (first_bases is append-only in
    # make_ceilings.py) — without this, a regression committed alongside a
    # full recording quietly raises its own bar on the next regeneration
    first = doc.get("first_bases", {})
    assert first, "ceilings.json lacks first_bases (run scripts/make_ceilings.py)"
    missing_first = [q for q in base if q not in first]
    assert not missing_first, f"queries without a first-recorded base: {missing_first}"
    raised = {
        q: (first[q], b)
        for q, b in base.items()
        if b > first[q] + 1e-9 and q not in doc.get("rebased", {})
    }
    assert not raised, f"bases raised past first-recorded without a rebase: {raised}"


def test_sf1_derived_recordings_scale_linearly():
    """Every committed sf1-derived recording must pass scale_smoke.check
    against its matching full sf0.1 recording (<=10x for 10x data, modulo
    the declared supra-linear exceptions)."""
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
    base_path, _ = _newest_full_recording()
    assert check(base_path, newest, 10.0) == 0, (
        f"{os.path.basename(newest)} failed scale check vs {os.path.basename(base_path)}"
    )
