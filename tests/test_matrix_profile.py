"""Matrix profile (STOMP) + CWT peak counting — independent-reference and
property tests (module is rows-only graded by design; see
operators/matrix_profile.py docstring)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from preprocessor_spark.operators.matrix_profile import (
    MP_FEATURES,
    extract_matrix_profile,
    find_peaks_cwt,
    mass_distance_profile,
    matrix_profile_summary,
    number_cwt_peaks,
    query_similarity_count,
    stomp,
)


# ---------------------------------------------------------------- kernels
def _brute_mp(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Straight-line O(n^2 m) reference: z-normalize every window explicitly
    and scan all pairs outside the exclusion zone."""
    n = len(x)
    k = n - m + 1
    excl = math.ceil(m / 4)
    z = []
    for i in range(k):
        w = x[i : i + m]
        sd = w.std()
        z.append((w - w.mean()) / sd if sd > 0 else None)
    mp = np.full(k, np.nan)
    mpi = np.full(k, -1)
    for i in range(k):
        best, best_j = np.inf, -1
        for j in range(k):
            if max(0, i - excl) <= j < min(k, i + excl + 1):
                continue
            if z[i] is None and z[j] is None:
                d = 0.0
            elif z[i] is None or z[j] is None:
                d = math.sqrt(m)
            else:
                d = float(np.linalg.norm(z[i] - z[j]))
            if d < best:
                best, best_j = d, j
        if np.isfinite(best):
            mp[i], mpi[i] = best, best_j
    return mp, mpi


def test_stomp_matches_bruteforce_exactly():
    rng = np.random.default_rng(7)
    x = rng.normal(size=80).cumsum()
    for m in (4, 8, 16):
        mp, mpi = stomp(x, m)
        ref_mp, _ = _brute_mp(x, m)
        assert mp.shape == ref_mp.shape
        np.testing.assert_allclose(mp, ref_mp, atol=1e-7)


def test_stomp_planted_motif_and_discord():
    rng = np.random.default_rng(3)
    x = rng.normal(scale=0.05, size=200).cumsum()
    pattern = np.sin(np.linspace(0, 4 * np.pi, 20))
    x[30:50] += 5 * pattern
    x[130:150] += 5 * pattern  # identical shape planted twice, far apart
    x[90] += 40.0  # discord spike
    mp, mpi = stomp(x, 20)
    # the two motif windows are each other's nearest match, near-zero dist
    assert mp[30] < 0.5 and mp[130] < 0.5
    assert abs(mpi[30] - 130) <= 2 and abs(mpi[130] - 30) <= 2
    summary = matrix_profile_summary(x, window=20)
    assert 85 <= summary["discord_position"] <= 95 or summary["discord_distance"] > summary["matrix_profile_median"]


def test_stomp_flat_series_contract():
    x = np.ones(40)
    mp, _ = stomp(x, 8)
    np.testing.assert_allclose(mp, 0.0)  # all windows flat -> all matches 0
    short = matrix_profile_summary(np.arange(4.0))
    assert math.isnan(short["matrix_profile_min"])  # too short -> NaN row


def test_mass_and_query_similarity_count():
    rng = np.random.default_rng(11)
    x = rng.normal(size=150).cumsum()
    q = x[40:60].copy()
    d = mass_distance_profile(q, x)
    assert d.shape == (131,)
    assert d[40] < 1e-6  # exact occurrence found at its own position
    # scale/offset invariance of z-normalized matching
    d2 = mass_distance_profile(3.0 * q + 17.0, x)
    np.testing.assert_allclose(d, d2, atol=1e-6)
    assert query_similarity_count(x, q, threshold=0.5) >= 1.0
    # query longer than the series -> no windows -> NaN
    assert math.isnan(query_similarity_count(x[:10], x[:20], threshold=1.0))


def test_find_peaks_cwt_counts_bumps():
    t = np.arange(300, dtype=float)
    clean = np.exp(-0.5 * ((t - 75) / 8) ** 2) + np.exp(-0.5 * ((t - 220) / 8) ** 2)
    locs = find_peaks_cwt(clean, np.arange(1, 11))
    assert len(locs) == 2
    assert min(abs(l - 75) for l in locs) <= 3
    assert min(abs(l - 220) for l in locs) <= 3
    assert number_cwt_peaks(clean, 5) >= 2.0
    # zero signal: every CWT row is identically zero -> strict relative
    # maxima find nothing -> no ridge lines, no peaks (non-zero constants
    # and ramps DO produce boundary maxima via 'same'-mode convolution edge
    # overlap, faithfully to the original algorithm)
    assert len(find_peaks_cwt(np.zeros(100), np.arange(1, 6))) == 0
    assert math.isnan(number_cwt_peaks(np.array([1.0, 2.0]), 5))


def test_filter_ridge_lines_zero_noise_zero_signal_drops():
    # scipy: snr = abs(0/0) = nan fails `nan >= min_snr` -> line dropped;
    # abs(x/0) = inf for x != 0 -> kept. The zero/zero case must NOT count.
    from preprocessor_spark.operators.matrix_profile import _filter_ridge_lines

    cwt = np.zeros((4, 40))
    cwt[:, 30] = 5.0  # nonzero ridge at col 30; col 10 stays all-zero
    zero_line = (np.array([0, 1, 2, 3]), np.array([10, 10, 10, 10]))
    live_line = (np.array([0, 1, 2, 3]), np.array([30, 30, 30, 30]))
    kept = _filter_ridge_lines(cwt, [zero_line, live_line], min_length=2)
    assert [l[1][0] for l in kept] == [30]


# ------------------------------------------------------------ Spark level
@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-matrix-profile")


def test_extract_matrix_profile_spark(spark):
    rng = np.random.default_rng(5)
    rows = []
    for uid in (1, 2, 3):
        series = rng.normal(size=60).cumsum()
        rows += [(uid, i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "user_id int, t int, value double")
    out = extract_matrix_profile(df, time="t", column_id="user_id")
    pdf = out.toPandas().set_index("user_id").sort_index()
    assert len(pdf) == 3
    assert set(pdf.columns) == {f"value__{n}" for n in MP_FEATURES}
    # values agree with the local kernel on the same series
    for uid in (1, 2, 3):
        series = np.array(
            [v for (u, i, v) in rows if u == uid], dtype=float
        )
        ref = matrix_profile_summary(series)
        got = pdf.loc[uid]
        assert got["value__matrix_profile_min"] == pytest.approx(
            ref["matrix_profile_min"], abs=1e-9
        )
        assert got["value__matrix_profile_median"] == pytest.approx(
            ref["matrix_profile_median"], abs=1e-9
        )
        assert got["value__number_cwt_peaks_n_5"] == number_cwt_peaks(series, 5)
    # determinism under repartition (rows-only grading invariant)
    out2 = extract_matrix_profile(df.repartition(7), time="t", column_id="user_id")
    pdf2 = out2.toPandas().set_index("user_id").sort_index()
    assert pdf2["value__matrix_profile_mean"].tolist() == pdf["value__matrix_profile_mean"].tolist()


def test_count_query_matches_spark(spark):
    """Planted motif census: user 1 carries the query pattern twice, user 2
    never — counts must match a local brute-force MASS scan exactly."""
    from preprocessor_spark.operators.matrix_profile import count_query_matches

    rng = np.random.default_rng(9)
    pattern = [3.0, 2.0, 1.0, 0.0, 1.0, 2.0, 3.0]
    s1 = list(rng.normal(scale=0.05, size=60).cumsum())
    s1[10:17] = [v + 10 * p for v, p in zip(s1[10:17], pattern)]
    s1[40:47] = [v + 10 * p for v, p in zip(s1[40:47], pattern)]
    s2 = list(rng.normal(scale=0.05, size=60).cumsum())
    rows = [(1, i, float(v)) for i, v in enumerate(s1)] + [
        (2, i, float(v)) for i, v in enumerate(s2)
    ]
    df = spark.createDataFrame(rows, "user_id int, t int, value double")
    got = {
        r["user_id"]: (r["n_windows"], r["match_count"])
        for r in count_query_matches(
            df, "t", "user_id", "value", pattern, threshold=1.0
        ).collect()
    }
    assert got[1][0] == 54 and got[2][0] == 54
    for uid, series in ((1, s1), (2, s2)):
        d = mass_distance_profile(np.array(pattern), np.array(series))
        assert got[uid][1] == int(np.count_nonzero(d < 1.0)), uid
    assert got[1][1] >= 2 and got[2][1] == 0


def test_extract_matrix_profile_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0)], "user_id int, t int, value double"
    )
    plan = extract_matrix_profile(df, "t", "user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "mapInPandas" in plan or "MapInPandas" in plan
