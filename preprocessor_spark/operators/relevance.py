"""tsfresh-parity feature relevance testing (driver-side, pure stdlib/numpy).

The reference delegates to tsfresh's ``extract_relevant_features``
(`/root/reference/clearbox_preprocessor/preprocessor.py:629`), whose
documented semantics (tsfresh ``relevance.calculate_relevance_table``) are
per-feature statistical hypothesis tests against the target followed by
Benjamini-Yekutieli FDR control — NOT a correlation threshold. A Pearson
rule diverges exactly where the tests matter: rank-separated groups whose
means coincide (Mann-Whitney fires, Pearson ≈ 0) and outlier-driven
correlations (Pearson fires, the rank test doesn't).

Test selection mirrors tsfresh:

===============  ===============  =========================================
target           feature          test
===============  ===============  =========================================
binary           real             Mann-Whitney U (two-sided)
binary           binary           Fisher exact (two-sided)
real             real             Kendall tau-b (two-sided)
real             binary           two-sample Kolmogorov-Smirnov
===============  ===============  =========================================

Constant features are irrelevant by definition (p = NaN). P-values use the
standard asymptotic approximations with tie/continuity corrections (scipy's
large-sample formulas; scipy itself is not available in this container —
the implementations below are from the published formulas). The feature
matrix is one row per SERIES, so this runs on the driver by construction —
the distributed work is the feature extraction, not the filter.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "mann_whitney_u_p",
    "kendall_tau_p",
    "fisher_exact_p",
    "ks_2samp_p",
    "benjamini_yekutieli",
    "relevance_table",
]


def _norm_sf(z: float) -> float:
    """P(Z > z) for standard normal."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def mann_whitney_u_p(x0: np.ndarray, x1: np.ndarray) -> float:
    """Two-sided Mann-Whitney U p-value, normal approximation with tie and
    continuity corrections (the scipy ``method="asymptotic"`` formula)."""
    n0, n1 = len(x0), len(x1)
    if n0 == 0 or n1 == 0:
        return float("nan")
    pooled = np.concatenate([x0, x1])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_vals = pooled[order]
    # average ranks for ties
    i = 0
    n = len(pooled)
    while i < n:
        j = i
        while j + 1 < n and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    r1 = ranks[n0:].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n0 * n1 / 2.0
    _, counts = np.unique(pooled, return_counts=True)
    tie_term = float((counts.astype(np.float64) ** 3 - counts).sum())
    var = n0 * n1 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    if var <= 0:
        return 1.0  # all values tied: no evidence either way
    z = (abs(u1 - mu) - 0.5) / math.sqrt(var)
    return min(1.0, 2.0 * _norm_sf(z))


def _tie_counts(v: np.ndarray) -> np.ndarray:
    _, c = np.unique(v, return_counts=True)
    return c[c > 1].astype(np.float64)


def kendall_tau_p(x: np.ndarray, y: np.ndarray, block: int = 2048) -> float:
    """Two-sided Kendall tau-b p-value via the normal approximation of the
    S statistic with the standard tie-corrected variance. S is computed
    with blocked pairwise sign products to bound memory at O(block·n)."""
    n = len(x)
    if n < 2:
        return float("nan")
    s = 0.0
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        dx = np.sign(x[lo:hi, None] - x[None, :])
        dy = np.sign(y[lo:hi, None] - y[None, :])
        # count each unordered pair once: mask to strictly-upper triangle
        cols = np.arange(n)[None, :]
        rows = np.arange(lo, hi)[:, None]
        m = cols > rows
        s += float((dx * dy * m).sum())
    t = _tie_counts(x)
    u = _tie_counts(y)
    v0 = n * (n - 1) * (2 * n + 5)
    vt = float((t * (t - 1) * (2 * t + 5)).sum())
    vu = float((u * (u - 1) * (2 * u + 5)).sum())
    v1 = float((t * (t - 1)).sum()) * float((u * (u - 1)).sum()) / (2.0 * n * (n - 1))
    v2 = 0.0
    if n > 2:
        v2 = (
            float((t * (t - 1) * (t - 2)).sum())
            * float((u * (u - 1) * (u - 2)).sum())
            / (9.0 * n * (n - 1) * (n - 2))
        )
    var = (v0 - vt - vu) / 18.0 + v1 + v2
    if var <= 0:
        return 1.0
    z = abs(s) / math.sqrt(var)
    return min(1.0, 2.0 * _norm_sf(z))


def fisher_exact_p(a: int, b: int, c: int, d: int) -> float:
    """Two-sided Fisher exact test for the 2x2 table [[a, b], [c, d]]:
    sum of hypergeometric probabilities no larger than the observed one."""
    n = a + b + c + d
    r1, c1 = a + b, a + c
    if r1 == 0 or c1 == 0 or r1 == n or c1 == n:
        return 1.0
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)

    def logp(k: int) -> float:
        return (
            math.lgamma(r1 + 1) - math.lgamma(k + 1) - math.lgamma(r1 - k + 1)
            + math.lgamma(n - r1 + 1) - math.lgamma(c1 - k + 1)
            - math.lgamma(n - r1 - c1 + k + 1)
            - (math.lgamma(n + 1) - math.lgamma(c1 + 1) - math.lgamma(n - c1 + 1))
        )

    p_obs = logp(a)
    total = 0.0
    for k in range(lo, hi + 1):
        lp = logp(k)
        if lp <= p_obs + 1e-12:  # scipy's relative-epsilon tie rule
            total += math.exp(lp)
    return min(1.0, total)


def ks_2samp_p(x0: np.ndarray, x1: np.ndarray) -> float:
    """Two-sample Kolmogorov-Smirnov p-value (asymptotic Kolmogorov
    distribution with the Stephens small-sample adjustment)."""
    n0, n1 = len(x0), len(x1)
    if n0 == 0 or n1 == 0:
        return float("nan")
    allv = np.concatenate([x0, x1])
    cdf0 = np.searchsorted(np.sort(x0), allv, side="right") / n0
    cdf1 = np.searchsorted(np.sort(x1), allv, side="right") / n1
    d = float(np.abs(cdf0 - cdf1).max())
    en = math.sqrt(n0 * n1 / (n0 + n1))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam <= 0:
        return 1.0
    total = 0.0
    for k in range(1, 101):
        term = (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        total += term
        if abs(term) < 1e-10:
            break
    return min(1.0, max(0.0, 2.0 * total))


def benjamini_yekutieli(pvals: list[float], fdr_level: float = 0.05) -> list[bool]:
    """BY step-up procedure (FDR under arbitrary dependence — tsfresh's
    default): reject H_(1..k*) where k* = max{k : p_(k) <= k*q/(m*c(m))},
    c(m) = sum_{j=1..m} 1/j. NaN p-values never reject."""
    m = len(pvals)
    if m == 0:
        return []
    cm = sum(1.0 / j for j in range(1, m + 1))
    indexed = sorted(
        ((p if not math.isnan(p) else float("inf")), i) for i, p in enumerate(pvals)
    )
    k_star = 0
    for k, (p, _) in enumerate(indexed, start=1):
        if p <= k * fdr_level / (m * cm):
            k_star = k
    rejected = [False] * m
    for k in range(k_star):
        rejected[indexed[k][1]] = True
    return rejected


def _is_binary(v: np.ndarray) -> bool:
    return len(np.unique(v)) == 2


def relevance_table(
    matrix: dict[str, np.ndarray],
    labels: np.ndarray,
    fdr_level: float = 0.05,
) -> dict[str, tuple[float, bool]]:
    """{feature: (p_value, relevant)} with the tsfresh test-selection table
    and BY FDR control across all tested features. Features constant after
    NaN removal get p = NaN and are never relevant."""
    labels = np.asarray(labels, dtype=np.float64)
    target_binary = _is_binary(labels)
    names, pvals = [], []
    for name, vals in matrix.items():
        v = np.asarray(vals, dtype=np.float64)
        mask = ~np.isnan(v)
        v2, y2 = v[mask], labels[mask]
        if len(v2) < 2 or len(np.unique(v2)) < 2 or len(np.unique(y2)) < 2:
            names.append(name)
            pvals.append(float("nan"))
            continue
        feat_binary = _is_binary(v2)
        if target_binary:
            y_vals = np.unique(y2)
            g0, g1 = v2[y2 == y_vals[0]], v2[y2 == y_vals[1]]
            if feat_binary:
                f_vals = np.unique(v2)
                p = fisher_exact_p(
                    int((g0 == f_vals[0]).sum()), int((g0 == f_vals[1]).sum()),
                    int((g1 == f_vals[0]).sum()), int((g1 == f_vals[1]).sum()),
                )
            else:
                p = mann_whitney_u_p(g0, g1)
        else:
            if feat_binary:
                f_vals = np.unique(v2)
                p = ks_2samp_p(y2[v2 == f_vals[0]], y2[v2 == f_vals[1]])
            else:
                p = kendall_tau_p(v2, y2)
        names.append(name)
        pvals.append(float(p))
    rejected = benjamini_yekutieli(pvals, fdr_level)
    return {n: (p, r) for n, p, r in zip(names, pvals, rejected)}
