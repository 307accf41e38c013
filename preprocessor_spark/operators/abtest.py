"""Controlled-experiment analysis — CUPED variance reduction.

CUPED (Deng, Xu, Kohavi & Walker, WSDM 2013: "Improving the Sensitivity of
Online Controlled Experiments by Utilizing Pre-Experiment Data") adjusts a
per-unit metric ``y`` with a pre-period covariate ``x``:

    theta = cov(x, y) / var(x)            (pooled across variants)
    y_cuped = y - theta * (x - mean(x))

The adjusted metric has the same expectation per variant (x predates the
treatment, so E[x|variant] is equal) but its variance shrinks by the
squared correlation — the standard way A/B platforms cut experiment
runtimes. Complements :mod:`operators/hypotests` (Welch's t runs ON the
adjusted metric).

Engine-portability contract (same recipe as hypotests/linreg): ONE
aggregation computes exact DECIMAL moments (n, Σx, Σy, Σx², Σxy — and per
variant the same), so theta and every adjusted mean is one deterministic
IEEE double expression over exact sums — VALUE-oracle-able. A pre/post-cast
count certificate raises on DECIMAL overflow instead of silently dropping
rows (|v| >= 1e14 with the default DECIMAL(18,4) cast).

Scale shape: one map-side-combinable groupBy(variant) — output is
|variants| rows; no second pass, no window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,8)"

_OVERFLOW_MSG = (
    "cuped: input magnitude >= 1e14 overflows the DECIMAL(18,4) moment cast "
    "to NULL under non-ANSI Spark; pre-scale the metric/covariate"
)


def cuped_adjusted_means(
    df: DataFrame,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """Per-variant raw and CUPED-adjusted metric means + variance reduction.

    Returns one row per variant: (variant, n, mean_raw, mean_cuped,
    var_raw, var_cuped, theta, var_reduction_pct). theta is pooled over
    ALL variants (the unbiased choice — per-variant thetas leak treatment
    information into the adjustment). Rows with a null variant, metric, or
    covariate are dropped.
    """
    y = F.col(metric_col).cast("decimal(18,4)")
    x = F.col(covariate_col).cast("decimal(18,4)")
    base = df.where(
        F.col(variant_col).isNotNull()
        & F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
    )
    cells = base.groupBy(F.col(variant_col).alias("variant")).agg(
        # post-cast count over BOTH casts: either overflowing to NULL under
        # non-ANSI Spark makes n < n_raw and trips the certificate
        F.count(F.when(x.isNotNull() & y.isNotNull(), F.lit(1))).alias("n"),
        F.count(F.col(metric_col)).alias("n_raw"),
        F.sum(x.cast(_DEC)).alias("sx"),
        F.sum(y.cast(_DEC)).alias("sy"),
        F.sum((x * x).cast(_DEC)).alias("sxx"),
        F.sum((x * y).cast(_DEC)).alias("sxy"),
        F.sum((y * y).cast(_DEC)).alias("syy"),
    )
    # pooled moments derive from the |variants|-sized cell frame
    from pyspark.sql import Window

    wg = Window.partitionBy()
    tn = F.sum("n").over(wg).cast("double")
    tsx = F.sum("sx").over(wg).cast("double")
    tsy = F.sum("sy").over(wg).cast("double")
    tsxx = F.sum("sxx").over(wg).cast("double")
    tsxy = F.sum("sxy").over(wg).cast("double")
    # pooled cov(x,y)/var(x) — population moments (the scale factor cancels)
    theta = (tsxy - tsx * tsy / tn) / (tsxx - tsx * tsx / tn)
    mean_x_pool = tsx / tn
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    mean_raw = sy / n
    # y_c = y - theta (x - pooled mean x): per-variant mean and variance
    # expand algebraically over the same exact sums
    mean_c = mean_raw - theta * (sx / n - mean_x_pool)
    var_raw = syy / n - mean_raw * mean_raw
    # var(y - theta x) = var(y) - 2 theta cov(x,y) + theta^2 var(x), all
    # within-variant population moments
    cov_v = sxy / n - (sx / n) * mean_raw
    var_x_v = sxx / n - (sx / n) * (sx / n)
    var_c = var_raw - 2.0 * theta * cov_v + theta * theta * var_x_v
    n_guarded = F.coalesce(
        F.assert_true(F.col("n") == F.col("n_raw"), F.lit(_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("n"),
    )
    return cells.select(
        "variant",
        n_guarded.alias("n"),
        F.round(mean_raw, 6).alias("mean_raw"),
        F.round(mean_c, 6).alias("mean_cuped"),
        # money^2 magnitudes: ROUND(x, k) is cross-engine-safe only while
        # |x|*10^k < 2^53 (beyond that DuckDB's float-mult rounding path
        # loses the integer part) — 2 decimals keeps ~7e11 variances safe
        F.round(var_raw, 2).alias("var_raw"),
        F.round(var_c, 2).alias("var_cuped"),
        F.round(theta, 6).alias("theta"),
        F.round(
            F.when(var_raw > 0, (F.lit(1.0) - var_c / var_raw) * 100.0), 4
        ).alias("var_reduction_pct"),
    )
