"""Whole-series tsfresh tier (operators/ts_spectral.py) — every family
checked against an independent straight-line reference implementation
(explicit DFT sums, brute-force template counting, Yule-Walker solves),
plus analytic betainc identities, degenerate inputs, and repartition
determinism."""

import math
from collections import Counter

import numpy as np
import pytest

from preprocessor_spark.operators import ts_spectral as S

RNG = np.random.default_rng(7)
SERIES = RNG.normal(2.0, 1.5, 80) + 0.05 * np.arange(80)


# ---------- pure-numpy kernels vs independent references ----------------

def test_fft_coefficient_matches_explicit_dft():
    feats = S._series_features(SERIES)
    n = len(SERIES)
    for k in (0, 1, 5, 17):
        # explicit O(n^2) DFT sum, no np.fft
        coeff = sum(
            SERIES[t] * complex(math.cos(-2 * math.pi * t * k / n),
                                math.sin(-2 * math.pi * t * k / n))
            for t in range(n)
        )
        assert feats[f"fft_coefficient_real_{k}"] == pytest.approx(coeff.real, abs=1e-8)
        assert feats[f"fft_coefficient_imag_{k}"] == pytest.approx(coeff.imag, abs=1e-8)
        assert feats[f"fft_coefficient_abs_{k}"] == pytest.approx(abs(coeff), abs=1e-8)
        assert feats[f"fft_coefficient_angle_{k}"] == pytest.approx(
            math.degrees(math.atan2(coeff.imag, coeff.real)), abs=1e-8
        )
    # coefficients beyond n//2 don't exist for a length-80 series
    assert feats["fft_coefficient_abs_70"] is None


def test_fft_aggregated_moments():
    feats = S._series_features(SERIES)
    spec = np.abs(np.fft.rfft(SERIES))
    idx = np.arange(len(spec))
    centroid = (spec * idx).sum() / spec.sum()
    var = (spec * idx**2).sum() / spec.sum() - centroid**2
    assert feats["fft_aggregated_centroid"] == pytest.approx(centroid)
    assert feats["fft_aggregated_variance"] == pytest.approx(var)


def test_sample_entropy_matches_bruteforce_loops():
    v = RNG.normal(0, 1, 60)
    feats = S._series_features(v)
    tol = 0.2 * v.std()

    def count(m):
        tpl = [v[i : i + m] for i in range(len(v) - m + 1)]
        hits = 0
        for i in range(len(tpl)):
            for j in range(i + 1, len(tpl)):
                if np.max(np.abs(tpl[i] - tpl[j])) <= tol:
                    hits += 1
        return hits

    b, a = count(2), count(3)
    assert feats["sample_entropy"] == pytest.approx(-math.log(a / b))


def test_approximate_entropy_matches_bruteforce():
    v = RNG.normal(0, 1, 50)
    feats = S._series_features(v)
    r = 0.5 * v.std()

    def phi(m):
        tpl = [v[i : i + m] for i in range(len(v) - m + 1)]
        tot = 0.0
        for t in tpl:
            c = sum(1 for u in tpl if np.max(np.abs(t - u)) <= r) / len(tpl)
            tot += math.log(c)
        return tot / len(tpl)

    assert feats["approximate_entropy_r_0_5"] == pytest.approx(abs(phi(2) - phi(3)))


def test_permutation_entropy_counter_reference():
    v = RNG.normal(0, 1, 40)
    feats = S._series_features(v)
    for d in (3, 5):
        pats = Counter(
            tuple(np.argsort(v[i : i + d], kind="stable")) for i in range(len(v) - d + 1)
        )
        total = sum(pats.values())
        ref = -sum((c / total) * math.log(c / total) for c in pats.values())
        assert feats[f"permutation_entropy_dimension_{d}"] == pytest.approx(ref)
    # strictly increasing series has exactly one ordinal pattern -> 0
    mono = S._series_features(np.arange(30, dtype=float))
    assert mono["permutation_entropy_dimension_3"] == pytest.approx(0.0)


def test_partial_autocorrelation_matches_yule_walker_solve():
    # AR(2)-ish series; pacf_k solves the order-k Yule-Walker system
    v = np.zeros(400)
    eps = RNG.normal(0, 1, 400)
    for t in range(2, 400):
        v[t] = 0.6 * v[t - 1] - 0.3 * v[t - 2] + eps[t]
    feats = S._series_features(v)
    n = len(v)
    vc = v - v.mean()
    acov = np.array([(vc[: n - l] * vc[l:]).sum() / n for l in range(10)])
    rho = acov / acov[0]
    for k in (1, 2, 4, 7):
        R = np.array([[rho[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(R, rho[1 : k + 1])
        assert feats[f"partial_autocorrelation_lag_{k}"] == pytest.approx(
            phi[-1], abs=1e-9
        )
    assert feats["partial_autocorrelation_lag_0"] == 1.0


def test_ar_coefficient_recovers_generating_process():
    v = np.zeros(3000)
    eps = RNG.normal(0, 0.5, 3000)
    for t in range(1, 3000):
        v[t] = 1.0 + 0.7 * v[t - 1] + eps[t]
    feats = S._series_features(v)
    assert feats["ar_coefficient_coeff_0_k_10"] == pytest.approx(1.0, abs=0.25)
    assert feats["ar_coefficient_coeff_1_k_10"] == pytest.approx(0.7, abs=0.07)
    for j in range(2, 11):
        assert abs(feats[f"ar_coefficient_coeff_{j}_k_10"]) < 0.1


def test_change_quantiles_direct_reference():
    v = SERIES
    feats = S._series_features(v)
    lo, hi = np.quantile(v, [0.2, 0.8])
    inside = (v >= lo) & (v <= hi)
    diffs = np.diff(v)[inside[:-1] & inside[1:]]
    assert feats["change_quantiles_mean_abs_1_ql_0_2_qh_0_8"] == pytest.approx(
        np.abs(diffs).mean()
    )
    assert feats["change_quantiles_var_abs_0_ql_0_2_qh_0_8"] == pytest.approx(
        diffs.var()
    )
    # ql quantile == qh quantile -> 0 by contract
    const = S._series_features(np.ones(30))
    assert const["change_quantiles_mean_abs_0_ql_0_2_qh_0_4"] == 0.0


def test_agg_linear_trend_and_linear_trend():
    v = SERIES
    feats = S._series_features(v)
    chunks = [v[i : i + 10].mean() for i in range(0, len(v), 10)]
    x = np.arange(len(chunks))
    slope, intercept = np.polyfit(x, chunks, 1)
    assert feats["agg_linear_trend_slope_chunk_10_mean"] == pytest.approx(slope)
    assert feats["agg_linear_trend_intercept_chunk_10_mean"] == pytest.approx(intercept)
    r = np.corrcoef(x, chunks)[0, 1]
    assert feats["agg_linear_trend_rvalue_chunk_10_mean"] == pytest.approx(r)
    # full-series trend: rvalue == corr(pos, x); strong planted trend
    full_r = np.corrcoef(np.arange(len(v)), v)[0, 1]
    assert feats["linear_trend_rvalue"] == pytest.approx(full_r)
    assert feats["linear_trend_pvalue"] < 1e-6  # planted slope is real


def test_betainc_analytic_identities():
    for x in (0.05, 0.3, 0.62, 0.9):
        # I_x(1, b) = 1 - (1-x)^b
        assert S._betainc(1.0, 4.0, x) == pytest.approx(1 - (1 - x) ** 4, abs=1e-12)
        # I_x(1/2, 1/2) = (2/pi) asin(sqrt(x))
        assert S._betainc(0.5, 0.5, x) == pytest.approx(
            2 / math.pi * math.asin(math.sqrt(x)), abs=1e-12
        )
        # symmetry
        assert S._betainc(2.5, 3.5, x) == pytest.approx(
            1 - S._betainc(3.5, 2.5, 1 - x), abs=1e-12
        )


def test_linear_trend_pvalue_on_pure_noise_is_uniformish():
    # 200 independent white-noise series: p-values should span (0,1);
    # a systematic bias would cluster them
    ps = []
    rng = np.random.default_rng(3)
    for _ in range(200):
        feats = S._linregress(rng.normal(0, 1, 50))
        ps.append(feats[3])
    ps = np.array(ps)
    assert 0.35 < (ps < 0.5).mean() < 0.65


def test_lempel_ziv_reference_sequence():
    # constant series is guarded (no bin edges) -> None
    assert S._series_features(np.ones(20))["lempel_ziv_complexity_bins_2"] is None
    v = np.array([0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0], dtype=float)
    feats = S._series_features(v)
    # hand-walk tsfresh's algorithm on the 2-bin discretization (== v)
    seq = v.astype(int)
    subs, ind, inc = set(), 0, 1
    while ind + inc <= len(seq):
        piece = tuple(seq[ind : ind + inc])
        if piece in subs:
            inc += 1
        else:
            subs.add(piece)
            ind += inc
            inc = 1
    assert feats["lempel_ziv_complexity_bins_2"] == pytest.approx(len(subs) / len(seq))


def test_cwt_matches_direct_convolution():
    v = SERIES[:50]
    feats = S._series_features(v)
    w = 5
    kernel = S._ricker(min(10 * w, len(v)), w)
    conv = np.convolve(v, kernel, mode="same")
    for k in (0, 7, 14):
        assert feats[f"cwt_coefficients_w_5_coeff_{k}"] == pytest.approx(conv[k])
    # ricker wavelet: near-zero mean (discrete truncation leaves ~1e-4) and
    # peak at center
    assert abs(kernel.sum()) < 1e-3
    assert kernel.argmax() == (len(kernel) - 1) // 2


def test_welch_sine_peak_location():
    # pure sine at 0.125 cycles/sample -> PSD peak at bin f*nperseg
    t = np.arange(512, dtype=float)
    v = np.sin(2 * np.pi * 0.125 * t)
    pxx = S._welch_psd(v)
    assert pxx.argmax() == round(0.125 * 256)


def test_mean_n_absolute_max_and_benford():
    feats = S._series_features(SERIES)
    ref = np.sort(np.abs(SERIES))[-7:].mean()
    assert feats["mean_n_absolute_max_n_7"] == pytest.approx(ref)
    # benford_correlation is a correlation -> [-1, 1]
    assert -1.0 <= feats["benford_correlation"] <= 1.0
    # short series: n < 7 -> None
    assert S._series_features(np.ones(3))["mean_n_absolute_max_n_7"] is None


def test_friedrich_langevin_on_ou_process():
    # Ornstein-Uhlenbeck drift is linear: dx ~ theta*(mu - x); the fitted
    # polynomial's real fixed point should sit near mu
    rng = np.random.default_rng(11)
    v = np.zeros(5000)
    v[0] = 3.0
    for t in range(1, 5000):
        v[t] = v[t - 1] + 0.2 * (3.0 - v[t - 1]) + rng.normal(0, 0.1)
    feats = S._series_features(v)
    assert feats["max_langevin_fixed_point"] == pytest.approx(3.0, abs=0.3)
    coeffs = [
        feats[f"friedrich_coefficients_coeff_{j}_m_3_r_30"] for j in range(4)
    ]
    assert all(c is not None for c in coeffs)


def test_degenerate_series():
    empty = S._series_features(np.array([]))
    assert all(v is None for v in empty.values())
    one = S._series_features(np.array([5.0]))
    assert one["fft_coefficient_real_0"] == pytest.approx(5.0)
    assert one["sample_entropy"] is None


# ---------- Spark integration -------------------------------------------

@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-ts-spectral", cpus=4)


def test_spark_matches_local_and_is_repartition_deterministic(spark):
    rows = []
    rng = np.random.default_rng(5)
    series = {}
    for sid in (1, 2, 3):
        v = rng.normal(sid, 1.0, 40 + 5 * sid)
        series[sid] = v
        rows += [(sid, i, float(x)) for i, x in enumerate(v)]
    # series 4 has nulls: they must drop out of the gathered series
    series[4] = np.array([1.0, 4.0, 2.0, 8.0, 5.0])
    rows += [(4, 0, 1.0), (4, 1, None), (4, 2, 4.0), (4, 3, 2.0),
             (4, 4, None), (4, 5, 8.0), (4, 6, 5.0)]
    df = spark.createDataFrame(rows, "id long, t long, value double")

    from preprocessor_spark.operators.ts_spectral import (
        SPECTRAL_FEATURES,
        extract_ts_features_spectral,
    )

    out = extract_ts_features_spectral(df, time="t", column_id="id")
    assert len(out.columns) == 1 + len(SPECTRAL_FEATURES)
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert set(got) == {1, 2, 3, 4}
    for sid, v in series.items():
        ref = S._series_features(np.asarray(v, dtype=float))
        for name in ("fft_coefficient_abs_1", "sample_entropy",
                     "linear_trend_rvalue", "change_quantiles_mean_abs_1_ql_0_qh_1",
                     "partial_autocorrelation_lag_2", "lempel_ziv_complexity_bins_5"):
            want = ref[name]
            have = got[sid][f"value__{name}"]
            if want is None:
                assert have is None, (sid, name, have)
            else:
                assert have == pytest.approx(want), (sid, name)

    # exact determinism under a different physical partitioning
    again = {
        r["id"]: r.asDict()
        for r in extract_ts_features_spectral(
            df.repartition(7), time="t", column_id="id"
        ).collect()
    }
    assert again == got


def test_welch_periodic_hann_values():
    """Value-level check vs scipy.signal.welch semantics (ADVICE round 7):
    one 8-sample segment, computed here from the textbook Welch formula
    with the periodic-Hann window values HARDCODED (denominator nperseg=8),
    so reintroducing np.hanning's symmetric window (denominator 7) fails."""
    v = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    # 0.5 - 0.5*cos(2*pi*n/8), n=0..7 — literal values
    w = np.array([0.0, 0.14644660940672627, 0.5, 0.8535533905932737,
                  1.0, 0.8535533905932737, 0.5, 0.14644660940672627])
    seg = (v - v.mean()) * w
    fx = np.fft.rfft(seg)
    expected = (fx.real**2 + fx.imag**2) / (w * w).sum()
    expected[1:-1] *= 2.0  # one-sided, even nperseg
    np.testing.assert_allclose(S._welch_psd(v), expected, rtol=1e-12)
    # symmetric np.hanning would change (w*w).sum() from exactly 3.0
    assert (w * w).sum() == pytest.approx(3.0, rel=1e-12)


def test_benford_keeps_zeros_in_denominator():
    """tsfresh maps zeros/NaN to digit 0 but keeps them in the .mean()
    denominator (ADVICE round 7): with half the series zero, every digit
    share is halved but the correlation is over the same shape."""
    base = np.array([1.0, 1.2, 2.5, 3.1, 1.9, 8.4, 1.1, 2.2, 9.9, 4.0])
    with_zeros = np.concatenate([base, np.zeros(10)])
    benford = np.log10(1.0 + 1.0 / np.arange(1, 10))

    def ref_corr(x):
        ax = np.abs(np.nan_to_num(x))
        digits = [int(f"{a:e}"[0]) if a > 0 else 0 for a in ax]
        dist = np.array([np.mean([d == k for d in digits]) for k in range(1, 10)])
        return float(np.corrcoef(benford, dist)[0, 1])

    f0 = S._series_features(base)["benford_correlation"]
    f1 = S._series_features(with_zeros)["benford_correlation"]
    assert f0 == pytest.approx(ref_corr(base), rel=1e-12)
    assert f1 == pytest.approx(ref_corr(with_zeros), rel=1e-12)
    # halving every share rescales dist linearly -> correlation unchanged
    assert f1 == pytest.approx(f0, rel=1e-12)


def test_langevin_uses_real_parts_of_complex_roots():
    """tsfresh takes max(np.real(roots)) over ALL cubic roots — complex
    included — and NaNs only when that exceeds max(x) (ADVICE round 7)."""
    coeffs = [1.0, -2.0, 4.0, -8.0]  # roots: 2, ±2i -> max real part = 2
    roots = np.roots(coeffs)
    assert np.isreal(roots).sum() == 1
    assert float(np.real(roots).max()) == pytest.approx(2.0)


def test_adf_mackinnon_critical_values():
    """The embedded MacKinnon response surface must reproduce the textbook
    asymptotic Dickey-Fuller critical values for regression='c': p(-3.43)
    ~= 1%, p(-2.86) ~= 5%, p(-2.57) ~= 10% — an EXTERNAL check on the
    constants, independent of any implementation here."""
    assert S._adf_pvalue(-3.43) == pytest.approx(0.01, abs=0.0015)
    assert S._adf_pvalue(-2.86) == pytest.approx(0.05, abs=0.002)
    assert S._adf_pvalue(-2.57) == pytest.approx(0.10, abs=0.003)
    # range clamps
    assert S._adf_pvalue(3.0) == 1.0
    assert S._adf_pvalue(-25.0) == 0.0
    # the small-p / large-p polynomial branches agree at the switch point
    lo = S._adf_pvalue(-1.61)
    hi = S._adf_pvalue(-1.6099999)
    assert hi == pytest.approx(lo, abs=1e-3)
    # monotone nonincreasing in the statistic across the whole range
    grid = np.linspace(-18.8, 2.7, 200)
    ps = [S._adf_pvalue(t) for t in grid]
    assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))


def test_adf_discriminates_unit_root_from_stationary():
    rng = np.random.default_rng(3)
    walk = np.cumsum(rng.normal(0, 1, 500))          # unit root
    ar = np.zeros(500)                               # stationary AR(1)
    for t in range(1, 500):
        ar[t] = 0.5 * ar[t - 1] + rng.normal(0, 1)
    stat_w, p_w, lag_w = S._adfuller(walk)
    stat_a, p_a, lag_a = S._adfuller(ar)
    assert p_w > 0.10          # cannot reject unit root on a random walk
    assert p_a < 0.01          # strongly rejects on stationary AR(1)
    assert stat_a < stat_w
    maxlag = int(np.ceil(12 * (500 / 100) ** 0.25))
    assert 0 <= lag_w <= maxlag and 0 <= lag_a <= maxlag
    # deterministic
    assert S._adfuller(walk) == S._adfuller(walk)


def test_adf_lag0_teststat_matches_direct_regression():
    """When AIC selects k=0 the statistic must equal the straight-line
    OLS t-ratio of Δx_t on [x_{t-1}, 1], computed here independently."""
    rng = np.random.default_rng(9)
    x = np.zeros(120)
    for t in range(1, 120):
        x[t] = 0.2 * x[t - 1] + rng.normal(0, 1)
    stat, pval, usedlag = S._adfuller(x)
    if usedlag == 0:
        dep = np.diff(x)
        X = np.column_stack([x[:-1], np.ones(len(dep))])
        beta = np.linalg.solve(X.T @ X, X.T @ dep)
        resid = dep - X @ beta
        s2 = resid @ resid / (len(dep) - 2)
        se = np.sqrt(s2 * np.linalg.inv(X.T @ X)[0, 0])
        assert stat == pytest.approx(beta[0] / se, rel=1e-10)
    # degenerate inputs refuse instead of crashing
    assert S._adfuller(np.ones(50)) is None
    assert S._adfuller(np.arange(3.0)) is None


def test_adf_features_emitted():
    feats = S._series_features(SERIES)
    ts = feats["augmented_dickey_fuller_teststat_autolag_aic"]
    pv = feats["augmented_dickey_fuller_pvalue_autolag_aic"]
    lag = feats["augmented_dickey_fuller_usedlag_autolag_aic"]
    assert ts is not None and pv is not None and lag is not None
    assert 0.0 <= pv <= 1.0
    assert pv == pytest.approx(S._adf_pvalue(ts), rel=1e-12)
    assert lag == int(lag) >= 0
