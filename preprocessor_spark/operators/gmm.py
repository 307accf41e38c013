"""Gaussian mixture model — distributed EM over one-pass quantized moments,
bit-deterministic, no MLlib.

The canonical soft-clustering / density-estimation fit (Dempster, Laird &
Rubin 1977): K diagonal-covariance Gaussians. The distributed shape is the
repo's IRLS contract (`logreg`/`huber`/`quantreg`): the E-step's
responsibilities are PURE JVM column expressions (a per-row softmax over K
log-densities — no UDF, whole-stage codegen), and the M-step is ONE
map-side-combinable aggregation of K·(2p+1) weighted moments plus the
log-likelihood, all quantized to the 1e-9 int64 grid with overflow
certificates and the sticky exact-DECIMAL fallback — so the fit is
BIT-DETERMINISTIC across partitionings (floating-point EM normally isn't:
Σ r·x reorders under shuffle).

Initialization is deterministic too: component means start at the exact
interpolated per-feature quantiles ((k+½)/K), variances at the global
variance, weights uniform — no RNG, so two runs (or two engines running
the same recipe) produce identical parameter trajectories.

Rows-only grading by design (iterative float fit): pytest checks
numpy-EM step equivalence on the same quantization grid, planted-cluster
recovery with cluster purity, the EM monotone log-likelihood guarantee,
repartition bit-determinism, and validation.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG_2PI = math.log(2.0 * math.pi)


def _log_pdf(xs: list[Column], mu: list[float], var: list[float]) -> Column:
    """Diagonal-Gaussian log density as a fixed-association expression."""
    lp = F.lit(0.0)
    for x, m, v in zip(xs, mu, var):
        lp = lp + F.lit(-0.5) * (
            F.lit(_LOG_2PI + math.log(v)) + (x - F.lit(m)) * (x - F.lit(m)) / F.lit(v)
        )
    return lp


def gmm_fit(
    df: DataFrame,
    features: list[str],
    k: int = 3,
    max_iter: int = 30,
    tol: float = 1e-7,
    var_floor: float = 1e-6,
) -> dict:
    """Fit a K-component diagonal GMM on ``features``.

    Returns {"n", "k", "weights", "means" (k×p), "variances" (k×p),
    "log_likelihood", "iterations", "converged"}. Components are ordered
    by their first-feature mean at every report (a canonical labeling, so
    determinism is checkable). Rows with any null feature drop listwise.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    p = len(features)
    clean = df.dropna(subset=features).select(
        *[F.col(c).cast("double").alias(c) for c in features]
    )
    clean = clean.persist()  # scanned once per EM step
    # AQE adds a stage-materialization round-trip to every EM step's tiny
    # fixed-shape aggregation (the sample is persisted and partition counts
    # are known) — turn it off for the fit loop and restore after.
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        qs = [(j + 0.5) / k for j in range(k)]
        init = clean.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.percentile(F.col(c), F.array(*[F.lit(q) for q in qs])).alias(
                    f"q_{c}"
                )
                for c in features
            ],
            *[F.var_pop(F.col(c)).alias(f"v_{c}") for c in features],
        ).collect()[0]
        n_total = init["n"]
        if n_total < k * (p + 1):
            raise ValueError(f"gmm_fit: {n_total} rows < {k * (p + 1)} parameters")
        means = [[float(init[f"q_{c}"][j]) for c in features] for j in range(k)]
        variances = [
            [max(float(init[f"v_{c}"]), var_floor) for c in features]
            for j in range(k)
        ]
        weights = [1.0 / k] * k

        from preprocessor_spark.operators.logreg import (
            _I64_SAFE,
            _SCALE,
            _qsum_dec,
            _quant,
        )

        xs = [F.col(c) for c in features]
        prev_ll = None
        it = 0
        converged = False
        use_dec = False
        for it in range(1, max_iter + 1):
            lps = [
                F.lit(math.log(weights[j])) + _log_pdf(xs, means[j], variances[j])
                for j in range(k)
            ]
            mx = F.greatest(*lps) if k > 1 else lps[0]
            exps = [F.exp(lp - mx) for lp in lps]
            denom = exps[0]
            for e in exps[1:]:
                denom = denom + e
            rs = [e / denom for e in exps]
            row_ll = mx + F.log(denom)

            # Materialize the softmax ONCE per row in a projection, then
            # aggregate trivial products of the projected columns. Inlining
            # the responsibilities into all K·(2p+1) aggregates duplicates
            # the whole exp/log subtree per moment — the generated aggregate
            # update method blows past the JIT method-size limit and runs
            # interpreted (measured 1.3 s vs 0.48 s per step at sf0.1).
            # Numerically identical: same expressions, same association.
            proj = clean.select(
                *features,
                row_ll.alias("__ll"),
                *[rs[j].alias(f"__r_{j}") for j in range(k)],
            )
            moments: list[tuple[str, Column]] = [("ll", F.col("__ll"))]
            for j in range(k):
                r = F.col(f"__r_{j}")
                moments.append((f"r_{j}", r))
                for ci, c in enumerate(features):
                    moments.append((f"rx_{j}_{ci}", r * xs[ci]))
                    moments.append((f"rxx_{j}_{ci}", r * xs[ci] * xs[ci]))

            def _collect_long() -> dict:
                # One shared certificate instead of one per moment: the
                # overflow checks below are uniform across moments, so
                # max over moments of max|scaled term| certifies them all
                # and halves the aggregate column count (driver-side
                # planning per EM step is the dominant cost at small SF).
                qs = [_quant(expr) for _, expr in moments]
                cert = F.abs(qs[0])
                for q in qs[1:]:
                    cert = F.greatest(cert, F.abs(q))
                aggs = [F.max(cert).alias("__cert")]
                aggs += [
                    F.sum(q.cast("long")).alias(name)
                    for (name, _), q in zip(moments, qs)
                ]
                return proj.agg(*aggs).collect()[0].asDict()

            def _collect_dec() -> dict:
                aggs = []
                for name, expr in moments:
                    aggs += _qsum_dec(expr, name)
                return proj.agg(*aggs).collect()[0].asDict()

            if use_dec:
                row = _collect_dec()
            else:
                try:
                    row = _collect_long()
                except Exception as exc:
                    if "OVERFLOW" not in str(exc).upper():
                        raise
                    use_dec = True
                    row = _collect_dec()
                else:
                    cert = float(row.get("__cert") or 0.0)
                    if cert >= _I64_SAFE:
                        raise ValueError(
                            "gmm_fit: a moment term overflows the 1e-9 "
                            "quantization grid; pre-scale the features"
                        )
                    if int(n_total) * cert >= _I64_SAFE:
                        use_dec = True
                        row = _collect_dec()

            def g(name: str) -> float:
                return row[name] / _SCALE

            ll = g("ll")
            new_means, new_vars, new_weights = [], [], []
            for j in range(k):
                nj = g(f"r_{j}")
                if nj <= 0:
                    # a starved component keeps its parameters (standard
                    # EM degeneracy guard) with a floor weight
                    new_means.append(means[j])
                    new_vars.append(variances[j])
                    new_weights.append(1e-12)
                    continue
                mu_j = [g(f"rx_{j}_{ci}") / nj for ci in range(p)]
                var_j = [
                    max(g(f"rxx_{j}_{ci}") / nj - mu_j[ci] * mu_j[ci], var_floor)
                    for ci in range(p)
                ]
                new_means.append(mu_j)
                new_vars.append(var_j)
                new_weights.append(nj / float(n_total))
            wsum = sum(new_weights)
            means = new_means
            variances = new_vars
            weights = [w / wsum for w in new_weights]
            if prev_ll is not None and abs(ll - prev_ll) <= tol * (1.0 + abs(ll)):
                prev_ll = ll
                converged = True
                break
            prev_ll = ll
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        clean.unpersist()
    order = sorted(range(k), key=lambda j: (means[j][0], means[j][1:] if p > 1 else 0))
    return {
        "n": int(n_total),
        "k": k,
        "weights": [weights[j] for j in order],
        "means": [means[j] for j in order],
        "variances": [variances[j] for j in order],
        "log_likelihood": float(prev_ll),
        "iterations": it,
        "converged": converged,
    }


def gmm_responsibility_exprs(
    fit: dict, features: list[str]
) -> list[Column]:
    """Per-row responsibilities for a fitted model as pure JVM expressions
    — score/assign a corpus inside codegen, no UDF (the
    ``logreg_predict_expr`` pattern)."""
    xs = [F.col(c) for c in features]
    lps = [
        F.lit(math.log(max(w, 1e-300))) + _log_pdf(xs, mu, var)
        for w, mu, var in zip(fit["weights"], fit["means"], fit["variances"])
    ]
    mx = F.greatest(*lps) if len(lps) > 1 else lps[0]
    exps = [F.exp(lp - mx) for lp in lps]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    return [e / denom for e in exps]
