"""Huber robust regression — IRLS over one-pass weighted moments.

The outlier-resistant sibling of `operators/linreg.py`: minimize
Σ ρ_δ(y − Xθ) with Huber's loss (quadratic inside δ, linear outside;
Huber 1964). IRLS form: each iteration reweights rows by
w = min(1, δ/|r|) and solves the weighted normal equations — the M-step
every robust-regression library (statsmodels RLM, sklearn HuberRegressor
modulo their σ estimation) runs.

Engine shape (the `logreg.py` contract): ONE map-side-combinable
aggregation per iteration computes the weighted Gram/moment sums; the
(p+1)×(p+1) solve is driver-side numpy. Terms are quantized to 1e-9 and
summed as int64 (the logreg scaled-int fast path) so the fit is
BIT-DETERMINISTIC across partitionings — with per-term and per-sum
overflow certificates that raise instead of silently wrapping. Scale δ is
a fixed caller parameter (pair with a one-pass MAD estimate from
`operators/stats.py` when σ is unknown) — estimating σ jointly (Huber's
Proposal 2) would add a second aggregate per pass, same shape.

Rows-only grading by design (an iterative float fit has no SQL twin):
pytest checks numpy-IRLS equivalence, outlier resistance vs OLS, the
clean-data ≈ OLS limit, and repartition bit-determinism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.operators.logreg import _qsum_long


def _cramer3(sw, s1, s2, s11, s12, s22, sy, s1y, s2y):
    """Solve [[sw,s1,s2],[s1,s11,s12],[s2,s12,s22]] θ = [sy,s1y,s2y] by
    Cramer's rule with a FIXED association order — the same expression
    tree `linreg._cramer2_thetas` emits Spark-side and the DuckDB IRLS
    oracles replay, so a SQL engine evaluating the identical text on the
    identical double moments reproduces every θ bit. Returns None when
    the system is singular (caller falls back to numpy's LU, which
    raises its usual LinAlgError)."""
    det = (
        sw * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    if det == 0.0:
        return None
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        sw * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        sw * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return det0 / det, det1 / det, det2 / det


def _solve_weighted_normal(g, p: int) -> np.ndarray:
    """Driver-side solve of the weighted normal equations from the moment
    getter ``g``. p == 2 rides the engine-exact Cramer tree (so the fit
    is VALUE-oracle-able — DuckDB replays the identical expression);
    other p use numpy's LU. Shared by huber_fit and quantile_fit."""
    if p == 2:
        t = _cramer3(
            g("s_w"), g("s_0"), g("s_1"),
            g("s_00"), g("s_10"), g("s_11"),
            g("s_y"), g("s_0y"), g("s_1y"),
        )
        if t is not None:
            return np.array(t)
    a = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    a[0, 0] = g("s_w")
    b[0] = g("s_y")
    for j in range(p):
        a[0, j + 1] = a[j + 1, 0] = g(f"s_{j}")
        b[j + 1] = g(f"s_{j}y")
        for i in range(j + 1):
            a[j + 1, i + 1] = a[i + 1, j + 1] = g(f"s_{j}{i}")
    return np.linalg.solve(a, b)


def huber_fit(
    df: DataFrame,
    features: list[str],
    target: str,
    delta: float = 1.35,
    max_iter: int = 50,
    tol: float = 1e-8,
) -> dict:
    """Fit y ≈ θ₀ + Σ θ_j x_j under Huber loss with scale ``delta``.

    Returns {"intercept", "coef", "n", "iterations", "converged",
    "n_downweighted"} — the last is the count of rows with w < 1 at the
    solution (the outliers the loss linearized). Rows with any null among
    the used columns drop listwise.
    """
    if delta <= 0:
        raise ValueError(f"delta must be > 0, got {delta}")
    cols = [*features, target]
    clean = df.dropna(subset=cols).select(
        *[F.col(c).cast("double").alias(c) for c in features],
        F.col(target).cast("double").alias(target),
    )
    clean = clean.persist()  # scanned once per IRLS step
    p = len(features)
    theta = np.zeros(p + 1)
    it = 0
    converged = False
    n = 0
    use_dec = False  # sticky: once the int64 engine trips, stay on DECIMAL
    # AQE adds a stage-materialization round-trip to every IRLS step's tiny
    # fixed-shape aggregation (the frame is persisted, the output one row) —
    # off for the fit loop, restored after; plan-level only, the quantized
    # sums are bit-identical either way (the gmm_fit pattern)
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # init from one unweighted OLS step (w = 1 everywhere)
        for it in range(1, max_iter + 1):
            r = F.lit(float(theta[0]))
            for j, fname in enumerate(features):
                r = r + F.lit(float(theta[j + 1])) * F.col(fname)
            r = F.col(target) - r
            if it == 1:
                w = F.lit(1.0)
            else:
                w = F.least(F.lit(1.0), F.lit(float(delta)) / F.abs(r))
            xs = {j: F.col(fname) for j, fname in enumerate(features)}
            moments = [("s_w", w), ("s_y", w * F.col(target))]
            for j, fname in enumerate(features):
                moments.append((f"s_{j}", w * xs[j]))
                moments.append((f"s_{j}y", w * xs[j] * F.col(target)))
                for i in range(j + 1):
                    moments.append((f"s_{j}{i}", w * xs[j] * xs[i]))

            def _collect(qsum) -> dict:
                aggs = [F.count(F.lit(1)).alias("n")]
                for name, expr in moments:
                    aggs += qsum(expr, name)
                return clean.agg(*aggs).collect()[0].asDict()

            from preprocessor_spark.operators.logreg import (
                _I64_SAFE,
                _qsum_dec,
            )

            # fast path: scaled-int64 sums; big-money moments (price×price
            # terms at 1e-9 scale) overflow int64, which ANSI Spark raises
            # at aggregation time — fall back to the exact DECIMAL engine
            # (the SAME per-row scaled integers, so determinism holds) and
            # STAY there: the weight updates can't shrink the moments
            # enough to re-qualify, so retrying int64 per iteration would
            # just pay a failed job each pass
            if use_dec:
                row = _collect(_qsum_dec)
            else:
                try:
                    row = _collect(_qsum_long)
                except Exception as exc:  # ARITHMETIC_OVERFLOW from the sum
                    if "OVERFLOW" not in str(exc).upper():
                        raise
                    use_dec = True
                    row = _collect(_qsum_dec)
                else:
                    certs = [
                        float(row.get(f"__cert_{name}") or 0.0)
                        for name, _ in moments
                    ]
                    if any(c >= _I64_SAFE for c in certs):
                        raise ValueError(
                            "huber_fit: a moment term overflows the 1e-9 "
                            "quantization grid; pre-scale the columns"
                        )
                    if any(int(row["n"]) * c >= _I64_SAFE for c in certs):
                        # non-ANSI engines wrap instead of raising: re-run
                        # on the exact decimal engine before trusting sums
                        use_dec = True
                        row = _collect(_qsum_dec)
            n = row["n"]
            if n < p + 1:
                raise ValueError(f"huber_fit: {n} rows < {p + 1} parameters")

            from preprocessor_spark.operators.logreg import _SCALE

            def g(name: str) -> float:
                # float() FIRST, divide second: a SQL twin computes
                # CAST(hugeint_sum AS DOUBLE)/1e9 (two roundings), so the
                # driver does the identical int->double->divide sequence
                # instead of Python's single correctly-rounded int/float
                return float(row[name]) / _SCALE

            new_theta = _solve_weighted_normal(g, p)
            if np.max(np.abs(new_theta - theta)) < tol:
                theta = new_theta
                converged = True
                break
            theta = new_theta
        # downweighted count at the solution
        r = F.lit(float(theta[0]))
        for j, fname in enumerate(features):
            r = r + F.lit(float(theta[j + 1])) * F.col(fname)
        n_down = clean.where(
            F.abs(F.col(target) - r) > F.lit(float(delta))
        ).count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        clean.unpersist()
    return {
        "n": int(n),
        "intercept": float(theta[0]),
        "coef": [float(t) for t in theta[1:]],
        "iterations": it,
        "converged": converged,
        "n_downweighted": int(n_down),
    }
