"""Isotonic (PAV) — independent minimax-identity reference and invariants.
Cross-engine parity is covered by the isotonic_discount_returnrate DuckDB
oracle (which evaluates the minimax identity in SQL)."""

from __future__ import annotations

import numpy as np
import pytest

from preprocessor_spark.operators.isotonic import _pav, isotonic_fit


def _minimax(y, w):
    """Independent O(n^3) closed form: yhat_i = max_{j<=i} min_{k>=i} of
    the weighted mean over [j..k]."""
    n = len(y)
    cs = np.concatenate([[0.0], np.cumsum(np.asarray(y, float) * w)])
    cw = np.concatenate([[0], np.cumsum(w)])
    out = []
    for i in range(n):
        best = -np.inf
        for j in range(i + 1):
            mn = min(
                (cs[k + 1] - cs[j]) / (cw[k + 1] - cw[j]) for k in range(i, n)
            )
            best = max(best, mn)
        out.append(best)
    return out


def test_pav_equals_minimax_identity():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 12))
        y = rng.integers(0, 40, n).tolist()  # block sums (exact ints)
        w = rng.integers(1, 9, n).tolist()
        got = _pav(y, w)
        want = _minimax([yi / wi for yi, wi in zip(y, w)], w)
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))  # monotone


def test_pav_already_monotone_is_identity():
    assert _pav([0, 5, 20], [2, 5, 10]) == [0.0, 1.0, 2.0]


def test_pav_single_violation_pools():
    # means 3, 1 -> pooled to (3+1)/2 with equal weights
    assert _pav([3, 1], [1, 1]) == [2.0, 2.0]


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-isotonic")


def test_isotonic_fit_calibrates_binary(spark):
    rng = np.random.default_rng(9)
    rows = []
    for _ in range(3000):
        x = float(rng.integers(0, 10)) / 10.0
        p = min(0.95, 0.05 + x)  # monotone truth
        rows.append((x, int(rng.random() < p)))
    df = spark.createDataFrame(rows, "x double, y int")
    out = isotonic_fit(df, "x", "y").orderBy("x").collect()
    ys = [r.y_iso for r in out]
    assert ys == sorted(ys)  # monotone output
    assert len(out) == 10 and sum(r.n for r in out) == 3000
    # ends bracket the truth
    assert ys[0] < 0.3 and ys[-1] > 0.7
    # weighted mean is preserved under PAV
    tot = sum(r.y_iso * r.n for r in out)
    raw = sum(r.y_mean * r.n for r in out)
    assert tot == pytest.approx(raw, rel=1e-6)


def test_isotonic_repartition_deterministic(spark):
    rng = np.random.default_rng(4)
    rows = [(float(rng.integers(0, 8)), float(rng.normal())) for _ in range(500)]
    df = spark.createDataFrame(rows, "x double, y double")
    a = isotonic_fit(df, "x", "y").orderBy("x").collect()
    b = isotonic_fit(df.repartition(17), "x", "y").orderBy("x").collect()
    assert a == b
