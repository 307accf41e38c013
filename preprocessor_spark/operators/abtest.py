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


def two_proportion_ztest(
    df: DataFrame,
    variant_col: str,
    success_col,
    control: str | None = None,
    alpha: float = 0.05,
    power: float = 0.8,
) -> DataFrame:
    """Two-proportion z-test of every treatment variant against the
    control — the conversion-rate counterpart of the CUPED/Welch pipeline.

    Per (control, treatment) pair, from EXACT success/total counts:
    pooled z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t)), two-sided
    normal p-value via the shared Zelen-Severo polynomial
    (:func:`preprocessor_spark.operators.hypotests._normal_sf` — a
    closed-form double expression both engines replay), Wald CI on the
    difference, and the prospective per-arm sample size for detecting the
    OBSERVED difference at the requested alpha/power (the classic
    (z_{α/2}+z_β)²(p_c q_c + p_t q_t)/δ² planning formula; the normal
    quantiles are driver-side plan constants). Every number is a
    deterministic IEEE expression over exact BIGINT counts —
    VALUE-oracle-able.

    ``control`` defaults to the lexicographically smallest variant. One
    map-side-combined groupBy; the frame never exceeds |variants| rows.
    """
    from preprocessor_spark.operators.hypotests import _normal_sf

    v = F.col(variant_col)
    s = F.col(success_col).cast("int")
    cells = (
        df.where(v.isNotNull() & F.col(success_col).isNotNull())
        .groupBy(v.alias("variant"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(s).alias("k"))
    )
    if control is None:
        control = cells.agg(F.min("variant")).collect()[0][0]
    ctrl = cells.where(F.col("variant") == F.lit(control)).select(
        F.col("n").alias("n_c"), F.col("k").alias("k_c")
    )
    pairs = cells.where(F.col("variant") != F.lit(control)).crossJoin(
        F.broadcast(ctrl)
    )
    n_c, k_c = F.col("n_c").cast("double"), F.col("k_c").cast("double")
    n_t, k_t = F.col("n").cast("double"), F.col("k").cast("double")
    p_c, p_t = k_c / n_c, k_t / n_t
    p_pool = (k_c + k_t) / (n_c + n_t)
    se_pool = F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / n_c + 1.0 / n_t))
    z = (p_t - p_c) / se_pool
    se_wald = F.sqrt(p_c * (1.0 - p_c) / n_c + p_t * (1.0 - p_t) / n_t)
    z_a = _norm_ppf(1.0 - alpha / 2.0)
    z_b = _norm_ppf(power)
    delta = p_t - p_c
    n_req = F.when(
        F.abs(delta) > 0,
        F.ceil(
            F.lit((z_a + z_b) ** 2)
            * (p_c * (1.0 - p_c) + p_t * (1.0 - p_t))
            / (delta * delta)
        ).cast("bigint"),
    )
    return pairs.select(
        F.lit(control).alias("control"),
        F.col("variant").alias("treatment"),
        F.col("n_c").cast("bigint").alias("n_control"),
        F.col("k_c").cast("bigint").alias("k_control"),
        F.col("n").cast("bigint").alias("n_treatment"),
        F.col("k").cast("bigint").alias("k_treatment"),
        F.round(p_c, 6).alias("rate_control"),
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(delta, 6).alias("diff"),
        F.round(z, 6).alias("z"),
        F.round(2.0 * _normal_sf(F.abs(z)), 6).alias("p_value"),
        F.round(delta - F.lit(z_a) * se_wald, 6).alias("ci_lo"),
        F.round(delta + F.lit(z_a) * se_wald, 6).alias("ci_hi"),
        n_req.alias("n_per_arm_for_observed_diff"),
    ).orderBy("treatment")


def diff_in_diff(
    df: DataFrame,
    treated_col: str,
    post_col: str,
    y_col: str,
) -> DataFrame:
    """Two-group × two-period difference-in-differences estimator — the
    quasi-experimental workhorse when randomization isn't available
    (Card & Krueger 1994 canonically): under the parallel-trends
    assumption the treatment effect is

        DiD = (ȳ_treated,post − ȳ_treated,pre)
            − (ȳ_control,post − ȳ_control,pre)

    with the large-sample SE from the four independent cell variances,
    sqrt(Σ s²_cell/n_cell). ``treated_col`` and ``post_col`` must be
    boolean (or 0/1) flags.

    Engine-portability contract (the cuped recipe): ONE groupBy over the
    two flags computes exact DECIMAL moments (n, Σy, Σy²) per cell, the
    4-row cell frame pivots to one row, and every output is a fixed IEEE
    expression over the exact sums — VALUE-oracle-able. The same
    DECIMAL(18,4) overflow certificate as CUPED. Returns one row:
    (n, the four cell means, per-group deltas, did_effect, se, z,
    ci95_lo, ci95_hi).
    """
    y = F.col(y_col).cast("decimal(18,4)")
    base = df.where(
        F.col(treated_col).isNotNull()
        & F.col(post_col).isNotNull()
        & F.col(y_col).isNotNull()
    )
    cells = base.groupBy(
        F.col(treated_col).cast("int").alias("t"),
        F.col(post_col).cast("int").alias("p"),
    ).agg(
        F.count(F.when(y.isNotNull(), F.lit(1))).alias("n"),
        F.count(F.col(y_col)).alias("n_raw"),
        F.sum(y.cast(_DEC)).alias("sy"),
        F.sum((y * y).cast(_DEC)).alias("syy"),
    )

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("t") == t) & (F.col("p") == p), F.col(col))
        )

    pivoted = cells.groupBy().agg(
        F.sum("n").alias("n"),
        F.sum("n_raw").alias("n_raw"),
        *[
            cell(t, p, c).alias(f"{c}_{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
            for c in ("n", "sy", "syy")
        ],
    )
    guard = F.coalesce(
        F.assert_true(F.col("n") == F.col("n_raw"), F.lit(_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("n"),
    )

    def m(t: int, p: int):
        return F.col(f"sy_{t}{p}").cast("double") / F.col(
            f"n_{t}{p}"
        ).cast("double")

    def v(t: int, p: int):
        n = F.col(f"n_{t}{p}").cast("double")
        sy = F.col(f"sy_{t}{p}").cast("double")
        syy = F.col(f"syy_{t}{p}").cast("double")
        return (syy - sy * sy / n) / (n - F.lit(1.0))

    effect = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    se = F.sqrt(
        v(1, 1) / F.col("n_11").cast("double")
        + v(1, 0) / F.col("n_10").cast("double")
        + v(0, 1) / F.col("n_01").cast("double")
        + v(0, 0) / F.col("n_00").cast("double")
    )
    z975 = F.lit(1.959963984540054)
    return pivoted.select(
        guard.alias("n"),
        m(0, 0).alias("mean_control_pre"),
        m(0, 1).alias("mean_control_post"),
        m(1, 0).alias("mean_treated_pre"),
        m(1, 1).alias("mean_treated_post"),
        (m(0, 1) - m(0, 0)).alias("diff_control"),
        (m(1, 1) - m(1, 0)).alias("diff_treated"),
        effect.alias("did_effect"),
        se.alias("se"),
        (effect / se).alias("z"),
        (effect - z975 * se).alias("ci95_lo"),
        (effect + z975 * se).alias("ci95_hi"),
    )


def sequential_ztest_looks(
    df: DataFrame,
    variant_col: str,
    y_col: str,
    period_col: str,
) -> DataFrame:
    """Group-sequential experiment monitoring: one two-sample z-test per
    cumulative "look" (period), with the two classical always-valid
    stopping boundaries every A/B platform ships —

    - the O'Brien-Fleming SHAPE boundary z_{α/2}·sqrt(K/k) (conservative
      early, nominal at the final look; the standard normal-approximation
      form of OBF 1979), and
    - the Haybittle-Peto rule (|z| > 3 at every interim look, z_{α/2} at
      the final — Haybittle 1971, Peto et al. 1976),

    so peeking at every period keeps the overall false-positive rate
    near α = 0.05 instead of inflating it (the "why you can't just peek"
    correction). ``variant_col`` must be a 0/1 flag.

    Engine contract: per-(variant, period) exact DECIMAL cells, ordered
    cumulative DECIMAL window sums (order-free — decimal addition is
    exact), then a fixed IEEE tree per look — VALUE-oracle-able. One
    groupBy + one |periods|-row window; nothing collects."""
    y = F.col(y_col).cast("decimal(18,4)")
    base = df.where(
        F.col(variant_col).isNotNull()
        & F.col(y_col).isNotNull()
        & F.col(period_col).isNotNull()
    )
    cells = base.groupBy(
        F.col(variant_col).cast("int").alias("v"),
        F.col(period_col).alias("period"),
    ).agg(
        F.count(F.when(y.isNotNull(), F.lit(1))).alias("n"),
        F.count(F.col(y_col)).alias("n_raw"),
        F.sum(y.cast(_DEC)).alias("sy"),
        F.sum((y * y).cast(_DEC)).alias("syy"),
    )
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("v")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.select(
        "v",
        "period",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("n_raw").over(wcum).alias("cn_raw"),
        F.sum("sy").over(wcum).alias("csy"),
        F.sum("syy").over(wcum).alias("csyy"),
    )
    a = cum.where(F.col("v") == 1).select(
        "period",
        F.col("cn").alias("n1"),
        F.col("cn_raw").alias("n1_raw"),
        F.col("csy").alias("sy1"),
        F.col("csyy").alias("syy1"),
    )
    b = cum.where(F.col("v") == 0).select(
        "period",
        F.col("cn").alias("n0"),
        F.col("cn_raw").alias("n0_raw"),
        F.col("csy").alias("sy0"),
        F.col("csyy").alias("syy0"),
    )
    j = a.join(b, "period")
    wall = Window.partitionBy()
    k_total = F.count(F.lit(1)).over(wall).cast("double")
    look = F.row_number().over(Window.partitionBy().orderBy("period"))

    def mv(n, sy, syy):
        nd = F.col(n).cast("double")
        s = F.col(sy).cast("double")
        ss = F.col(syy).cast("double")
        return s / nd, (ss - s * s / nd) / (nd - F.lit(1.0)), nd

    m1, v1, n1 = mv("n1", "sy1", "syy1")
    m0, v0, n0 = mv("n0", "sy0", "syy0")
    z = (m1 - m0) / F.sqrt(v1 / n1 + v0 / n0)
    guard = F.coalesce(
        F.assert_true(
            (F.col("n1") == F.col("n1_raw")) & (F.col("n0") == F.col("n0_raw")),
            F.lit(_OVERFLOW_MSG),
        ).cast("long"),
        F.col("n1") + F.col("n0"),
    )
    z975 = F.lit(1.959963984540054)
    lk = look.cast("double")
    obf = z975 * F.sqrt(k_total / lk)
    hp = F.when(look == F.count(F.lit(1)).over(wall), z975).otherwise(
        F.lit(3.0)
    )
    return j.select(
        look.alias("look"),
        "period",
        guard.alias("n_cum"),
        m1.alias("mean_treated"),
        m0.alias("mean_control"),
        z.alias("z"),
        obf.alias("obf_bound"),
        hp.alias("hp_bound"),
        (F.abs(z) > obf).alias("cross_obf"),
        (F.abs(z) > hp).alias("cross_hp"),
    )


def _norm_ppf(q: float) -> float:
    """Scalar standard-normal quantile (Acklam's rational approximation,
    |rel err| < 1.15e-9) — driver-side only (plan constants)."""
    import math

    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if q < plow:
        u = math.sqrt(-2 * math.log(q))
        return (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u + c[5]) / (
            (((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1
        )
    if q > phigh:
        u = math.sqrt(-2 * math.log(1 - q))
        return -(((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4]) * u + c[5]) / (
            (((d[0] * u + d[1]) * u + d[2]) * u + d[3]) * u + 1
        )
    u = q - 0.5
    r = u * u
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * u / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )
