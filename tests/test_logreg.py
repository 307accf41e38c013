"""Distributed IRLS logistic regression — optimality-certificate tests.

Rows-only graded (iterative driver-side solve is not SQL-expressible); the
certificates here are path-independent: the exact penalized gradient at the
returned θ (recomputed independently in numpy from raw data) must vanish,
a closed-form case must be reproduced, and fits must be bit-identical
across repartitionings (the quantized-decimal moment sums)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from preprocessor_spark.operators.logreg import logreg_fit, logreg_predict_expr


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-logreg")


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(0)
    n = 4000
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    z = 0.7 - 1.3 * x1 + 0.5 * x2
    y = (rng.random(n) < 1 / (1 + np.exp(-z))).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    return df, np.column_stack([np.ones(n), x1, x2]), y


def test_gradient_vanishes_at_solution(synth):
    """Independent optimality certificate: ∇ℓ(θ̂) = Xᵀ(y - σ(Xθ̂)) ≈ 0,
    recomputed in numpy from the raw rows — true iff θ̂ is the MLE,
    regardless of how the fit got there."""
    df, X, y = synth
    fit = logreg_fit(df, ["x1", "x2"], "y")
    assert fit["converged"] and fit["n"] == len(y)
    th = np.array([fit["intercept"], *fit["coef"]])
    mu = 1 / (1 + np.exp(-np.clip(X @ th, -30, 30)))
    assert float(np.max(np.abs(X.T @ (y - mu)))) < 1e-5
    # coefficients in the neighborhood of the generating truth
    assert abs(fit["intercept"] - 0.7) < 0.2
    assert abs(fit["coef"][0] + 1.3) < 0.2
    assert abs(fit["coef"][1] - 0.5) < 0.2


def test_l2_gradient_certificate(synth):
    """With penalty: Xᵀ(y-μ) - λθ₁: = 0 (intercept unpenalized)."""
    df, X, y = synth
    lam = 5.0
    fit = logreg_fit(df, ["x1", "x2"], "y", l2=lam)
    th = np.array([fit["intercept"], *fit["coef"]])
    mu = 1 / (1 + np.exp(-np.clip(X @ th, -30, 30)))
    g = X.T @ (y - mu)
    g[1:] -= lam * th[1:]
    assert float(np.max(np.abs(g))) < 1e-5
    # shrinkage: penalized coefs strictly smaller in norm
    unpen = logreg_fit(df, ["x1", "x2"], "y")
    assert np.linalg.norm(fit["coef"]) < np.linalg.norm(unpen["coef"])


def test_closed_form_single_binary_feature(spark):
    """Saturated 2x2 case: intercept = log odds at x=0, slope = log
    odds-ratio — exact analytic MLE."""
    rows = (
        [(0.0, 0.0)] * 60 + [(0.0, 1.0)] * 40 + [(1.0, 0.0)] * 20 + [(1.0, 1.0)] * 80
    )
    fit = logreg_fit(
        spark.createDataFrame(rows, "x double, y double"), ["x"], "y"
    )
    assert fit["intercept"] == pytest.approx(math.log(40 / 60), abs=1e-7)
    assert fit["coef"][0] == pytest.approx(
        math.log(80 / 20) - math.log(40 / 60), abs=1e-7
    )


def test_deterministic_across_repartition(synth):
    df, _, _ = synth
    a = logreg_fit(df, ["x1", "x2"], "y")
    b = logreg_fit(df.repartition(13), ["x1", "x2"], "y")
    assert a["intercept"] == b["intercept"] and a["coef"] == b["coef"]


def test_separable_data_finite_under_l2(spark):
    """Perfectly separable data has no finite MLE; the L2 ridge keeps the
    Newton iteration bounded and convergent."""
    rows = [(float(i), 0.0) for i in range(-50, 0)] + [
        (float(i), 1.0) for i in range(1, 51)
    ]
    fit = logreg_fit(
        spark.createDataFrame(rows, "x double, y double"), ["x"], "y", l2=1.0
    )
    assert fit["converged"] and np.isfinite(fit["coef"][0])


def test_nulls_dropped_listwise_and_underdetermined_raises(spark):
    df = spark.createDataFrame(
        [(1.0, None, 1.0), (None, 1.0, 0.0), (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (2.0, 1.0, 1.0)],
        "x1 double, x2 double, y double",
    )
    fit = logreg_fit(df, ["x1", "x2"], "y", l2=0.5)
    assert fit["n"] == 3  # the two null-bearing rows dropped
    with pytest.raises(ValueError, match="rows < "):
        logreg_fit(df.limit(2).dropna(), ["x1", "x2"], "y")


def test_predict_expr_scores_in_codegen(spark, synth):
    """logreg_predict_expr is a pure column expression: no UDF/Arrow node
    in the plan, and its scores match numpy exactly."""
    df, X, y = synth
    fit = logreg_fit(df, ["x1", "x2"], "y")
    scored = df.select(
        logreg_predict_expr(fit["intercept"], fit["coef"], ["x1", "x2"]).alias("p")
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    got = np.array([r["p"] for r in scored.collect()])
    th = np.array([fit["intercept"], *fit["coef"]])
    want = 1 / (1 + np.exp(-np.clip(X @ th, -30, 30)))
    np.testing.assert_allclose(got, want, atol=1e-12)
