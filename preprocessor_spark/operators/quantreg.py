"""Quantile (pinball-loss) regression — IRLS over one-pass weighted moments.

Linear regression for a CONDITIONAL QUANTILE instead of the mean:
minimize Σ ρ_τ(y − Xθ) with the pinball loss ρ_τ(r) = r·(τ − 1[r<0])
(Koenker & Bassett 1978). The engine is the iteratively-reweighted
least-squares linearization (Schlossmacher 1973 for L1, generalized to
asymmetric weights): each step reweights rows by

    w = |τ − 1[r < 0]| / max(|r|, eps)

and solves the weighted normal equations — exactly the
:mod:`preprocessor_spark.operators.huber` machinery with a different
weight formula, so this module shares its scaled-int64 one-pass moment
engine (the `logreg.py` contract): ONE map-side-combinable aggregation
per iteration, driver-side (p+1)×(p+1) numpy solve, 1e-9 quantization
with per-term/per-sum overflow certificates and the sticky exact-DECIMAL
fallback — BIT-deterministic across partitionings.

``eps`` is the standard IRLS-L1 smoothing floor: residuals inside ±eps
stop driving infinite weights (and the fixpoint is that of the
eps-smoothed pinball loss — tightening eps tightens the approximation at
the cost of conditioning). Rows-only grading by design (iterative float
fit, no SQL twin): pytest checks numpy-IRLS step equivalence, the ~τ
below-line residual fraction, median-regression outlier resistance, and
the τ ordering property (higher τ ⇒ higher fitted line).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_fit(
    df: DataFrame,
    features: list[str],
    target: str,
    tau: float = 0.5,
    max_iter: int = 50,
    tol: float = 1e-8,
    eps: float = 1e-6,
) -> dict:
    """Fit the conditional τ-quantile line y_τ ≈ θ₀ + Σ θ_j x_j.

    Returns {"intercept", "coef", "n", "iterations", "converged",
    "frac_below"} — the last is the fraction of residuals strictly below
    the fitted line at the solution (≈ τ by the quantile property). Rows
    with any null among the used columns drop listwise.
    """
    if not (0.0 < tau < 1.0):
        raise ValueError(f"tau must be in (0, 1), got {tau}")
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
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
    use_dec = False  # sticky DECIMAL fallback, same policy as huber_fit
    # AQE off for the fit loop (the huber_fit/gmm_fit pattern): each step's
    # one-row aggregation otherwise pays a stage-materialization round-trip
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for it in range(1, max_iter + 1):
            r = F.lit(float(theta[0]))
            for j, fname in enumerate(features):
                r = r + F.lit(float(theta[j + 1])) * F.col(fname)
            r = F.col(target) - r
            if it == 1:
                w = F.lit(1.0)  # OLS init
            else:
                asym = F.when(r < 0, F.lit(1.0 - tau)).otherwise(F.lit(float(tau)))
                w = asym / F.greatest(F.abs(r), F.lit(float(eps)))
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
                _qsum_long,
            )

            if use_dec:
                row = _collect(_qsum_dec)
            else:
                try:
                    row = _collect(_qsum_long)
                except Exception as exc:
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
                            "quantile_fit: a moment term overflows the 1e-9 "
                            "quantization grid; pre-scale the columns"
                        )
                    if any(int(row["n"]) * c >= _I64_SAFE for c in certs):
                        use_dec = True
                        row = _collect(_qsum_dec)
            n = row["n"]
            if n < p + 1:
                raise ValueError(f"quantile_fit: {n} rows < {p + 1} parameters")

            from preprocessor_spark.operators.huber import (
                _solve_weighted_normal,
            )
            from preprocessor_spark.operators.logreg import _SCALE

            def g(name: str) -> float:
                # float() first, divide second — matches the SQL twin's
                # CAST(sum AS DOUBLE)/1e9 sequence (see huber_fit)
                return float(row[name]) / _SCALE

            new_theta = _solve_weighted_normal(g, p)
            if np.max(np.abs(new_theta - theta)) < tol:
                theta = new_theta
                converged = True
                break
            theta = new_theta
        r = F.lit(float(theta[0]))
        for j, fname in enumerate(features):
            r = r + F.lit(float(theta[j + 1])) * F.col(fname)
        n_below = clean.where(F.col(target) < r).count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        clean.unpersist()
    return {
        "n": int(n),
        "intercept": float(theta[0]),
        "coef": [float(t) for t in theta[1:]],
        "iterations": it,
        "converged": converged,
        "frac_below": float(n_below) / float(n) if n else float("nan"),
    }
