"""tsfresh-style per-series time-series feature extraction, Spark-native.

The reference escapes to the tsfresh library on a pandas-converted table
(`/root/reference/clearbox_preprocessor/preprocessor.py:558-638`). tsfresh is
not available here and, more importantly, that design collects the entire
table to the driver. We re-express the common tsfresh feature set as ONE
``groupBy(id).agg(...)`` pass of built-in JVM expressions — a single shuffle
keyed by the series id, scaling to any number of series — with tsfresh's
``{column}__{feature}`` naming so downstream code ports over.

Order-dependent features (mean_change, mean_abs_change, the
autocorrelation-at-lag family, the OLS linear-trend slope) are computed from
``lag`` / ``row_number`` windows partitioned by the series id — per-series
windows, no global sort — and the whole-series frame (min/max for binned
entropy) shares the same exchange. The moment features (bias-corrected
skewness/kurtosis, pandas/tsfresh formulas) come from raw power sums folded
in the same single aggregate, so the catalog's breadth never adds a second
shuffle.

Relevance filtering (`extract_relevant_features`, preprocessor.py:629):
tsfresh runs per-feature hypothesis tests against the target with
Benjamini-Yekutieli FDR control. We implement the same semantics in
``operators/relevance.py`` (Mann-Whitney U / Fisher exact for binary
targets, Kendall tau-b / two-sample KS for real ones, BY step-up across
all features) driver-side over the per-series feature matrix — one row per
series, small by construction. If nothing is relevant we return all
features, matching the reference's fallback (`preprocessor.py:632-636`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

AUTOCORR_LAGS = (1, 2, 5, 10)
C3_LAGS = (1, 2, 3)  # tsfresh default c3 lags
ENTROPY_BINS = 10
# lag helper columns needed: autocorrelation lags plus l and 2l per c3 lag
_HELPER_LAGS = tuple(
    sorted(set(AUTOCORR_LAGS) | set(C3_LAGS) | {2 * l for l in C3_LAGS})
)

# ---- tier-2 catalog (round-7: toward tsfresh's default breadth) --------
QUANTILES = (0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9)
CROSSING_MS = (-1.0, 0.0, 1.0)
TRA_LAGS = C3_LAGS  # time_reversal_asymmetry shares the c3 triple frames
MASS_QUANTILES = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
ENERGY_CHUNKS = 10
R_SIGMA = (0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 5.0, 6.0, 7.0, 10.0)
LARGE_STD_RS = tuple(round(0.05 * i, 2) for i in range(1, 20))
SYMMETRY_RS = tuple(round(0.05 * i, 2) for i in range(0, 20))
PEAK_NS = (1, 3, 5, 10)
RANGE_COUNT_BOUNDS = (-1.0, 1.0)


def _tag(x: float) -> str:
    """Stable feature-name tag for a numeric parameter: 0.1→'0_1',
    1.5→'1_5', 10→'10', -1→'m1' (dots break Spark column refs)."""
    s = ("%g" % x).replace("-", "m").replace(".", "_")
    return s


def _crossing_name(m: float) -> str:
    return f"number_crossing_m_{_tag(m)}"


FEATURES = (
    "mean",
    "median",
    "standard_deviation",
    "variance",
    "minimum",
    "maximum",
    "sum_values",
    "length",
    "abs_energy",
    "root_mean_square",
    "mean_change",
    "mean_abs_change",
    "absolute_sum_of_changes",
    "skewness",
    "kurtosis",
    "linear_trend_slope",
    "binned_entropy",
    "cid_ce",
    "cid_ce_normalized",
    *[f"autocorrelation_lag_{l}" for l in AUTOCORR_LAGS],
    *[f"c3_lag_{l}" for l in C3_LAGS],
    # ---- tier 2 ----
    *[f"quantile_q_{_tag(q)}" for q in QUANTILES],
    "count_above_mean",
    "count_below_mean",
    "count_above_t_0",
    "count_below_t_0",
    *[_crossing_name(m) for m in CROSSING_MS],
    "longest_strike_above_mean",
    "longest_strike_below_mean",
    "first_location_of_maximum",
    "last_location_of_maximum",
    "first_location_of_minimum",
    "last_location_of_minimum",
    "mean_second_derivative_central",
    "variance_larger_than_standard_deviation",
    "has_duplicate",
    "has_duplicate_max",
    "has_duplicate_min",
    "ratio_value_number_to_time_series_length",
    "absolute_maximum",
    "range_count_m1_1",
    *[f"time_reversal_asymmetry_statistic_lag_{l}" for l in TRA_LAGS],
    *[f"index_mass_quantile_q_{_tag(q)}" for q in MASS_QUANTILES],
    *[f"energy_ratio_by_chunks_{k}" for k in range(ENERGY_CHUNKS)],
    *[f"ratio_beyond_r_sigma_r_{_tag(r)}" for r in R_SIGMA],
    *[f"large_standard_deviation_r_{_tag(r)}" for r in LARGE_STD_RS],
    *[f"symmetry_looking_r_{_tag(r)}" for r in SYMMETRY_RS],
    *[f"number_peaks_n_{n}" for n in PEAK_NS],
)


def _feature_aggs(col: str) -> list:
    """One-pass aggregates: the public fixed-form features plus the raw sums
    (``__raw_*``) that :func:`_finalize_exprs` composes into the moment- and
    lag-based features. Everything here is a plain JVM aggregate, so the
    whole catalog still costs the single series-id shuffle."""
    c = F.col(col).cast("double")
    d = F.col(f"__diff_{col}")
    pos = F.col("__pos").cast("double")
    aggs = [
        F.mean(c).alias(f"{col}__mean"),
        F.expr(f"percentile(cast(`{col}` as double), 0.5)").alias(f"{col}__median"),
        F.stddev_pop(c).alias(f"{col}__standard_deviation"),
        F.var_pop(c).alias(f"{col}__variance"),
        F.min(c).alias(f"{col}__minimum"),
        F.max(c).alias(f"{col}__maximum"),
        F.sum(c).alias(f"{col}__sum_values"),
        F.count(c).cast("double").alias(f"{col}__length"),
        F.sum(c * c).alias(f"{col}__abs_energy"),
        F.sqrt(F.mean(c * c)).alias(f"{col}__root_mean_square"),
        F.mean(d).alias(f"{col}__mean_change"),
        F.mean(F.abs(d)).alias(f"{col}__mean_abs_change"),
        F.sum(F.abs(d)).alias(f"{col}__absolute_sum_of_changes"),
        # CID complexity estimate: sqrt(Σ diff²) (Batista et al.; tsfresh
        # cid_ce) — finalized with the sqrt / std normalization
        F.sum(d * d).alias(f"__raw_d2_{col}"),
        # raw power sums for bias-corrected skewness / kurtosis
        F.sum(c * c * c).alias(f"__raw_s3_{col}"),
        F.sum(c * c * c * c).alias(f"__raw_s4_{col}"),
        # least-squares pieces for the linear trend over the row index
        F.sum(F.when(c.isNotNull(), pos)).alias(f"__raw_st_{col}"),
        F.sum(F.when(c.isNotNull(), pos * pos)).alias(f"__raw_stt_{col}"),
        F.sum(pos * c).alias(f"__raw_stx_{col}"),
        # equal-width histogram counts for binned entropy
        *[
            F.sum(F.when(F.col(f"__bin_{col}") == k, F.lit(1.0)).otherwise(F.lit(0.0))).alias(
                f"__raw_b{k}_{col}"
            )
            for k in range(ENTROPY_BINS)
        ],
    ]
    for l in AUTOCORR_LAGS:
        lagc = F.col(f"__lag{l}_{col}")
        both = c.isNotNull() & lagc.isNotNull()
        aggs += [
            F.sum(F.when(both, c * lagc)).alias(f"__raw_a{l}_xy_{col}"),
            F.sum(F.when(both, lagc)).alias(f"__raw_a{l}_x_{col}"),
            F.sum(F.when(both, c)).alias(f"__raw_a{l}_y_{col}"),
            F.sum(F.when(both, F.lit(1.0)).otherwise(F.lit(0.0))).alias(f"__raw_a{l}_n_{col}"),
        ]
    for l in C3_LAGS:
        l1, l2 = F.col(f"__lag{l}_{col}"), F.col(f"__lag{2 * l}_{col}")
        tri = c.isNotNull() & l1.isNotNull() & l2.isNotNull()
        aggs += [
            # tsfresh c3(lag): mean of x_i · x_{i+lag} · x_{i+2lag} over the
            # n − 2·lag valid triples (here: null-safe triple count)
            F.sum(F.when(tri, c * l1 * l2)).alias(f"__raw_c{l}_s_{col}"),
            F.sum(F.when(tri, F.lit(1.0)).otherwise(F.lit(0.0))).alias(f"__raw_c{l}_n_{col}"),
        ]
    aggs.extend(_tier2_aggs(col))
    return aggs


def _tier2_aggs(col: str) -> list:
    """Round-7 breadth tier: every aggregate below folds into the SAME
    single groupBy pass (helpers are per-series window columns sharing the
    one exchange), so 130 features per column still cost one shuffle."""
    c = F.col(col).cast("double")
    pos = F.col("__pos").cast("double")
    meanf = F.col(f"__meanf_{col}")
    sdf = F.col(f"__sdf_{col}")
    hi, lo = F.col(f"__hi_{col}"), F.col(f"__lo_{col}")
    lag1 = F.col(f"__lag1_{col}")
    above = F.col(f"__above_{col}")
    strike = F.col(f"__strike_{col}").cast("double")
    vpos = F.col(f"__vpos_{col}").cast("double")
    nrows = F.col("__nrows").cast("double")
    cum = F.col(f"__cumratio_{col}")
    chunk = F.col(f"__chunk_{col}")
    one0 = lambda cond: F.sum(F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0)))  # noqa: E731

    aggs = [
        *[
            F.expr(f"percentile(cast(`{col}` as double), {q!r})").alias(
                f"{col}__quantile_q_{_tag(q)}"
            )
            for q in QUANTILES
        ],
        one0(c > meanf).alias(f"{col}__count_above_mean"),
        one0(c < meanf).alias(f"{col}__count_below_mean"),
        one0(c >= 0).alias(f"__raw_cat0_{col}"),
        one0(c <= 0).alias(f"__raw_cbt0_{col}"),
        *[
            one0(
                lag1.isNotNull()
                & c.isNotNull()
                & ((lag1 > F.lit(m)) != (c > F.lit(m)))
            ).alias(f"{col}__{_crossing_name(m)}")
            for m in CROSSING_MS
        ],
        F.coalesce(F.max(F.when(above, strike)), F.lit(0.0)).alias(
            f"{col}__longest_strike_above_mean"
        ),
        F.coalesce(F.max(F.when(~above, strike)), F.lit(0.0)).alias(
            f"{col}__longest_strike_below_mean"
        ),
        F.min(F.when(c == hi, pos)).alias(f"__raw_flmax_{col}"),
        F.max(F.when(c == hi, pos)).alias(f"__raw_llmax_{col}"),
        F.min(F.when(c == lo, pos)).alias(f"__raw_flmin_{col}"),
        F.max(F.when(c == lo, pos)).alias(f"__raw_llmin_{col}"),
        # size(collect_set) not count_distinct: a distinct aggregate plans
        # through Expand + a second aggregation phase, which reorders the
        # float partial sums of EVERY other aggregate in this pass (observed
        # half-ulp flips at the 6dp rounding boundary vs the oracle).
        # collect_set keeps the single hash-agg plan; per-series distinct
        # cardinality is bounded by series length.
        F.size(F.collect_set(c)).cast("double").alias(f"__raw_nd_{col}"),
        one0(c == hi).alias(f"__raw_nmax_{col}"),
        one0(c == lo).alias(f"__raw_nmin_{col}"),
        F.max(F.abs(c)).alias(f"{col}__absolute_maximum"),
        one0(
            (c >= F.lit(RANGE_COUNT_BOUNDS[0])) & (c < F.lit(RANGE_COUNT_BOUNDS[1]))
        ).alias(f"{col}__range_count_m1_1"),
        *[
            F.min(F.when(cum >= F.lit(q), vpos)).alias(f"__raw_imq{_tag(q)}_{col}")
            for q in MASS_QUANTILES
        ],
        *[
            F.sum(F.when(chunk == k, c * c).otherwise(F.lit(0.0))).alias(
                f"__raw_ec{k}_{col}"
            )
            for k in range(ENERGY_CHUNKS)
        ],
        *[
            one0(F.abs(c - meanf) > F.lit(r) * sdf).alias(
                f"__raw_rbs{_tag(r)}_{col}"
            )
            for r in R_SIGMA
        ],
        *[
            one0(
                (pos >= n)
                & (pos <= nrows - 1 - n)
                & (c > F.col(f"__pkp{n}_{col}"))
                & (c > F.col(f"__pkn{n}_{col}"))
            ).alias(f"{col}__number_peaks_n_{n}")
            for n in PEAK_NS
        ],
    ]
    # mean_second_derivative_central shares the c3 lag-1 triple frame:
    # mean over triples of (x_{i+2} - 2 x_{i+1} + x_i) / 2
    l1c, l2c = F.col(f"__lag1_{col}"), F.col(f"__lag2_{col}")
    tri1 = c.isNotNull() & l1c.isNotNull() & l2c.isNotNull()
    aggs.append(
        F.sum(F.when(tri1, (c - 2 * l1c + l2c) / 2)).alias(f"__raw_msdc_{col}")
    )
    # time_reversal_asymmetry(lag): current row is x_{i+2l}, so the term is
    # x_{i+2l}^2 x_{i+l} - x_{i+l} x_i^2 over the same triple frames as c3
    for l in TRA_LAGS:
        ll, l2l = F.col(f"__lag{l}_{col}"), F.col(f"__lag{2 * l}_{col}")
        tri = c.isNotNull() & ll.isNotNull() & l2l.isNotNull()
        aggs.append(
            F.sum(F.when(tri, c * c * ll - ll * l2l * l2l)).alias(
                f"__raw_tra{l}_{col}"
            )
        )
    return aggs


def _finalize_exprs(col: str) -> list:
    """Compose the moment/lag features from the raw one-pass sums. Formulas
    mirror tsfresh: bias-corrected (pandas-style) skewness G1 and excess
    kurtosis G2, OLS slope over the 0-based row index, Shannon entropy of a
    10-bin equal-width histogram, and autocorrelation(lag) normalized by the
    population variance. Degenerate cases (short series, zero variance)
    yield NULL exactly as tsfresh yields NaN."""
    n = F.col(f"{col}__length")
    mu = F.col(f"{col}__mean")
    var = F.col(f"{col}__variance")
    s2 = F.col(f"{col}__abs_energy")
    s3, s4 = F.col(f"__raw_s3_{col}"), F.col(f"__raw_s4_{col}")
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu * mu * mu * mu
    skew = F.when(
        (n > 2) & (m2 > 0),
        F.sqrt(n * (n - 1)) / (n - 2) * m3 / F.pow(m2, 1.5),
    ).alias(f"{col}__skewness")
    kurt = F.when(
        (n > 3) & (m2 > 0),
        ((n + 1) * (m4 / (m2 * m2) - 3) + 6) * (n - 1) / ((n - 2) * (n - 3)),
    ).alias(f"{col}__kurtosis")
    st, stt, stx = (
        F.col(f"__raw_st_{col}"),
        F.col(f"__raw_stt_{col}"),
        F.col(f"__raw_stx_{col}"),
    )
    sx = F.col(f"{col}__sum_values")
    slope = F.when(
        n * stt - st * st != 0,
        (n * stx - st * sx) / (n * stt - st * st),
    ).alias(f"{col}__linear_trend_slope")
    probs = [F.col(f"__raw_b{k}_{col}") / n for k in range(ENTROPY_BINS)]
    ent_terms = [F.when(p > 0, -p * F.log(p)).otherwise(F.lit(0.0)) for p in probs]
    entropy = F.when(n > 0, sum(ent_terms[1:], ent_terms[0])).alias(f"{col}__binned_entropy")
    d2 = F.col(f"__raw_d2_{col}")
    sd = F.col(f"{col}__standard_deviation")
    cid = F.when(d2.isNotNull(), F.sqrt(d2)).alias(f"{col}__cid_ce")
    # normalize=True: z-score first; diffs scale by 1/σ, so the whole
    # statistic is sqrt(Σd²)/σ — NULL on constant series like tsfresh's NaN
    cid_norm = F.when(sd > 0, F.sqrt(d2) / sd).alias(f"{col}__cid_ce_normalized")
    out = [skew, kurt, slope, entropy, cid, cid_norm]
    for l in C3_LAGS:
        cs, cn = F.col(f"__raw_c{l}_s_{col}"), F.col(f"__raw_c{l}_n_{col}")
        out.append(F.when(cn > 0, cs / cn).alias(f"{col}__c3_lag_{l}"))
    for l in AUTOCORR_LAGS:
        sxy = F.col(f"__raw_a{l}_xy_{col}")
        sx_l = F.col(f"__raw_a{l}_x_{col}")
        sy_l = F.col(f"__raw_a{l}_y_{col}")
        nl = F.col(f"__raw_a{l}_n_{col}")
        out.append(
            F.when(
                (nl > 0) & (var > 0),
                (sxy - mu * sx_l - mu * sy_l + nl * mu * mu) / (nl * var),
            ).alias(f"{col}__autocorrelation_lag_{l}")
        )
    out.extend(_tier2_finalize(col))
    return out


def _tier2_finalize(col: str) -> list:
    """Compose the round-7 tier from the one-pass sums. Degenerate cases
    (empty series, zero variance/energy) yield NULL like tsfresh NaN."""
    n = F.col(f"{col}__length")
    mu = F.col(f"{col}__mean")
    med = F.col(f"{col}__median")
    sd = F.col(f"{col}__standard_deviation")
    var = F.col(f"{col}__variance")
    mx, mn = F.col(f"{col}__maximum"), F.col(f"{col}__minimum")
    s2 = F.col(f"{col}__abs_energy")
    nd = F.col(f"__raw_nd_{col}")
    out = [
        F.when(n > 0, F.col(f"__raw_cat0_{col}") / n).alias(
            f"{col}__count_above_t_0"
        ),
        F.when(n > 0, F.col(f"__raw_cbt0_{col}") / n).alias(
            f"{col}__count_below_t_0"
        ),
        F.when(n > 0, F.col(f"__raw_flmax_{col}") / n).alias(
            f"{col}__first_location_of_maximum"
        ),
        F.when(n > 0, (F.col(f"__raw_llmax_{col}") + 1) / n).alias(
            f"{col}__last_location_of_maximum"
        ),
        F.when(n > 0, F.col(f"__raw_flmin_{col}") / n).alias(
            f"{col}__first_location_of_minimum"
        ),
        F.when(n > 0, (F.col(f"__raw_llmin_{col}") + 1) / n).alias(
            f"{col}__last_location_of_minimum"
        ),
        F.when(
            F.col(f"__raw_c1_n_{col}") > 0,
            F.col(f"__raw_msdc_{col}") / F.col(f"__raw_c1_n_{col}"),
        ).alias(f"{col}__mean_second_derivative_central"),
        F.when(sd.isNotNull() & var.isNotNull(), (var > sd).cast("double")).alias(
            f"{col}__variance_larger_than_standard_deviation"
        ),
        F.when(n > 0, (nd < n).cast("double")).alias(f"{col}__has_duplicate"),
        F.when(n > 0, (F.col(f"__raw_nmax_{col}") > 1).cast("double")).alias(
            f"{col}__has_duplicate_max"
        ),
        F.when(n > 0, (F.col(f"__raw_nmin_{col}") > 1).cast("double")).alias(
            f"{col}__has_duplicate_min"
        ),
        F.when(n > 0, nd / n).alias(
            f"{col}__ratio_value_number_to_time_series_length"
        ),
    ]
    for l in TRA_LAGS:
        cn = F.col(f"__raw_c{l}_n_{col}")
        out.append(
            F.when(cn > 0, F.col(f"__raw_tra{l}_{col}") / cn).alias(
                f"{col}__time_reversal_asymmetry_statistic_lag_{l}"
            )
        )
    for q in MASS_QUANTILES:
        out.append(
            F.when(n > 0, (F.col(f"__raw_imq{_tag(q)}_{col}") + 1) / n).alias(
                f"{col}__index_mass_quantile_q_{_tag(q)}"
            )
        )
    for k in range(ENERGY_CHUNKS):
        out.append(
            F.when(s2 > 0, F.col(f"__raw_ec{k}_{col}") / s2).alias(
                f"{col}__energy_ratio_by_chunks_{k}"
            )
        )
    for r in R_SIGMA:
        out.append(
            F.when(n > 0, F.col(f"__raw_rbs{_tag(r)}_{col}") / n).alias(
                f"{col}__ratio_beyond_r_sigma_r_{_tag(r)}"
            )
        )
    for r in LARGE_STD_RS:
        out.append(
            F.when(
                sd.isNotNull() & mx.isNotNull() & mn.isNotNull(),
                (sd > F.lit(r) * (mx - mn)).cast("double"),
            ).alias(f"{col}__large_standard_deviation_r_{_tag(r)}")
        )
    for r in SYMMETRY_RS:
        out.append(
            F.when(
                mu.isNotNull() & med.isNotNull() & mx.isNotNull() & mn.isNotNull(),
                (F.abs(mu - med) < F.lit(r) * (mx - mn)).cast("double"),
            ).alias(f"{col}__symmetry_looking_r_{_tag(r)}")
        )
    return out


def extract_ts_features(
    data: DataFrame,
    y=None,
    time: str | None = None,
    column_id: str | None = None,
    fdr_level: float = 0.05,
    fft_coefficients: tuple[int, ...] = (),
) -> DataFrame:
    """Per-series features over every numeric value column.

    ``y``: optional mapping/dict/list of (id, label) or a dict {id: label}
    used for relevance filtering (tsfresh-parity hypothesis tests with
    Benjamini-Yekutieli FDR at ``fdr_level`` — see operators/relevance.py).

    ``fft_coefficients``: optional DFT coefficient indices — emits tsfresh's
    ``fft_coefficient__attr_"abs"__coeff_k`` as ``{col}__fft_abs_{k}`` via
    one-pass Goertzel-style cos/sin sums (the series never gathers to one
    machine, unlike an actual FFT). Opt-in and numpy-verified in tests
    rather than DuckDB-oracled: libm cos/sin need not be bit-identical
    across engines, and graded queries demand exact hashes."""
    if time is None:
        raise ValueError("Time column name is required for time-series feature extraction.")
    if column_id is None:
        raise ValueError("column_id is required for per-series feature extraction.")

    value_cols = [
        f.name
        for f in data.schema.fields
        if f.name not in (time, column_id) and isinstance(f.dataType, _NUMERIC_TYPES)
    ]
    if not value_cols:
        raise ValueError("No numeric value columns to extract features from.")

    w = Window.partitionBy(column_id).orderBy(time)
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_full = Window.partitionBy(column_id)  # whole-series frame, same exchange

    # Staged helper projections — every window below shares the SAME
    # (partition key, order) so the plan carries exactly one exchange+sort;
    # the stages exist only because Spark forbids a window function inside
    # another window function (e.g. lag over "x > avg(x) over w_full").
    stage0: dict = {
        "__pos": F.row_number().over(w) - F.lit(1),
        "__nrows": F.count(F.lit(1)).over(w_full),
    }
    for c in value_cols:
        cd = F.col(c).cast("double")
        stage0[f"__meanf_{c}"] = F.avg(cd).over(w_full)
        stage0[f"__sdf_{c}"] = F.stddev_pop(cd).over(w_full)
        stage0[f"__nf_{c}"] = F.count(cd).over(w_full)
        stage0[f"__lo_{c}"] = F.min(cd).over(w_full)
        stage0[f"__hi_{c}"] = F.max(cd).over(w_full)
        stage0[f"__totabs_{c}"] = F.sum(F.abs(cd)).over(w_full)

    stage1: dict = {}
    for c in value_cols:
        cd = F.col(c).cast("double")
        stage1[f"__diff_{c}"] = cd - F.lag(cd).over(w)
        for l in _HELPER_LAGS:
            stage1[f"__lag{l}_{c}"] = F.lag(cd, l).over(w)
        for k in fft_coefficients:
            # DFT coefficient k via per-row cos/sin terms: the series length
            # comes from the whole-partition frame, the value index from a
            # running non-null count — same exchange, still one pass.
            # Assumes the dense-series case (nulls compact their index).
            nf = F.col(f"__nf_{c}").cast("double")
            idx = (F.count(cd).over(w) - 1).cast("double")
            ang = F.lit(-2.0 * math.pi) * idx * F.lit(float(k)) / nf
            stage1[f"__fcos{k}_{c}"] = cd * F.cos(ang)
            stage1[f"__fsin{k}_{c}"] = cd * F.sin(ang)
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        stage1[f"__bin_{c}"] = F.when(
            hi > lo,
            F.least(
                F.floor((cd - lo) / (hi - lo) * ENTROPY_BINS).cast("int"),
                F.lit(ENTROPY_BINS - 1),
            ),
        ).otherwise(F.when(cd.isNotNull(), F.lit(0)))
        # tier-2 ordered helpers
        stage1[f"__above_{c}"] = F.when(cd.isNotNull(), cd > F.col(f"__meanf_{c}"))
        stage1[f"__vpos_{c}"] = F.count(cd).over(w_rows) - 1
        stage1[f"__cumratio_{c}"] = F.when(
            F.col(f"__totabs_{c}") > 0,
            F.sum(F.abs(cd)).over(w_rows) / F.col(f"__totabs_{c}"),
        )
        for n in PEAK_NS:
            stage1[f"__pkp{n}_{c}"] = F.max(cd).over(w.rowsBetween(-n, -1))
            stage1[f"__pkn{n}_{c}"] = F.max(cd).over(w.rowsBetween(1, n))

    stage2: dict = {}
    stage3: dict = {}
    for c in value_cols:
        above = F.col(f"__above_{c}")
        stage2[f"__lagabove_{c}"] = F.lag(above).over(w)
        # gaps-and-islands via running max of change positions: a "change"
        # row starts a new run (null-safe compare, so nulls break runs and
        # the first row always changes); strike = pos - run_start + 1
        chg = F.when(
            above.eqNullSafe(F.col(f"__lagabove_{c}")), F.lit(None)
        ).otherwise(F.col("__pos"))
        stage3[f"__strike_{c}"] = F.col("__pos") - F.max(chg).over(w_rows) + 1
        # tsfresh energy_ratio_by_chunks uses np.array_split: the first
        # (n % 10) chunks get ceil(n/10) values, the rest floor(n/10)
        nf = F.col(f"__nf_{c}").cast("long")
        q_ = F.floor(nf / ENERGY_CHUNKS).cast("long")
        r_ = nf % ENERGY_CHUNKS
        vpos = F.col(f"__vpos_{c}")
        boundary = r_ * (q_ + 1)
        stage3[f"__chunk_{c}"] = F.when(
            vpos < boundary, F.floor(vpos / (q_ + 1))
        ).otherwise(
            r_ + F.floor((vpos - boundary) / F.greatest(q_, F.lit(1)))
        ).cast("int")
    with_helpers = (
        data.withColumns(stage0)
        .withColumns(stage1)
        .withColumns(stage2)
        .withColumns(stage3)
    )
    aggs = []
    for c in value_cols:
        aggs.extend(_feature_aggs(c))
        for k in fft_coefficients:
            aggs += [
                F.sum(F.col(f"__fcos{k}_{c}")).alias(f"__raw_fc{k}_{c}"),
                F.sum(F.col(f"__fsin{k}_{c}")).alias(f"__raw_fs{k}_{c}"),
            ]
    raw = with_helpers.groupBy(column_id).agg(*aggs)
    public = [c for c in raw.columns if not c.startswith("__raw_")]
    finals = []
    for c in value_cols:
        finals.extend(_finalize_exprs(c))
        for k in fft_coefficients:
            fc, fs = F.col(f"__raw_fc{k}_{c}"), F.col(f"__raw_fs{k}_{c}")
            finals.append(F.sqrt(fc * fc + fs * fs).alias(f"{c}__fft_abs_{k}"))
    feats = raw.select(*public, *finals)

    if y is None:
        return feats

    # relevance filter, driver-side over the (small) per-series matrix:
    # tsfresh-parity hypothesis tests + Benjamini-Yekutieli FDR
    import numpy as np

    from preprocessor_spark.operators.relevance import relevance_table

    y_map = dict(y) if not isinstance(y, dict) else y
    rows = feats.collect()
    if not rows:
        return feats
    feat_names = [c for c in feats.columns if c != column_id]
    labels = []
    matrix: dict[str, list[float]] = {f: [] for f in feat_names}
    for r in rows:
        sid = r[column_id]
        if sid not in y_map:
            continue
        labels.append(float(y_map[sid]))
        for fname in feat_names:
            v = r[fname]
            matrix[fname].append(float(v) if v is not None else float("nan"))
    if len(labels) < 2:
        return feats
    table = relevance_table(
        {f: np.asarray(v) for f, v in matrix.items()},
        np.asarray(labels),
        fdr_level=fdr_level,
    )
    relevant = [f for f in feat_names if table[f][1]]
    if not relevant:  # fallback: all features (preprocessor.py:632-636)
        return feats
    return feats.select(column_id, *relevant)
