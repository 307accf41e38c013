"""Per-key autoregressive fits and exponential smoothing — exact-moment
window passes, no statsmodels.

Classical time-series primitives the reference's pipeline lacks but any
analytics engine at scale needs (reference counterpart: the fit-statistics
single-pass design of `/root/reference/clearbox_preprocessor/preprocessor.py`
extended to lagged moments):

- :func:`ar2_yule_walker` — AR(2) coefficients per series via the
  Yule–Walker equations over exact lag-product sums, plus the one-step
  forecast. ONE per-key window exchange (lag + row_number share the
  (key, order) sort), then one map-side-combinable groupBy.
- :func:`ewma_last` — the exponentially-weighted moving average's final
  state per series, computed by the ordered-fold recursion over the last
  ``last_k`` observations (bounded-list contract).

Engine-portability contract: all data-sized reductions are exact DECIMAL
sums (values ride the same DECIMAL(18,4)-cast overflow certificate as
:func:`preprocessor_spark.operators.hypotests.welch_ttest`); boundary
values (first/last two observations) are exact single elements extracted
with row_number flags; every decimal→double conversion goes through the
floor/frac split-cast (:func:`~preprocessor_spark.operators.hypotests.
_dec_double`), so the assembled autocovariances — and therefore φ₁, φ₂
and the forecast — are bit-identical in any engine. The EWMA recursion
s ← α·x + (1−α)·s folds a pos-sorted bounded list left-to-right, which
DuckDB replays with ``list_reduce(list_sort(...))``.

Scale shape: both operators are one keyed window exchange + one groupBy;
state per key is O(1). No SinglePartition anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double, _WELCH_OVERFLOW_MSG

_DEC = "decimal(38,8)"


def ar2_yule_walker(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    min_len: int = 5,
) -> DataFrame:
    """Fit AR(2) per series by Yule–Walker and forecast one step ahead.

    Sample autocovariances use the biased (divide-by-n) convention:

        c_k = (1/n) Σ_{t>k} (x_t − m)(x_{t−k} − m)
            = (1/n) [P_k − m(S − tail_k) − m(S − head_k) + (n−k)m²]

    where S = Σx, P_k = Σ x_t·x_{t−k} are exact DECIMAL sums and
    head_k / tail_k (sums of the first/last k values) are exact because
    each term is a single row_number-flagged element. With r_k = c_k/c_0:

        φ₁ = r₁(1 − r₂)/(1 − r₁²)     φ₂ = (r₂ − r₁²)/(1 − r₁²)
        x̂_{n+1} = m + φ₁(x_n − m) + φ₂(x_{n−1} − m)

    Series shorter than ``min_len`` (or with zero variance / |r₁| = 1)
    yield NULL coefficients. Returns one row per key: key, n, mean, r1,
    r2, phi1, phi2, forecast (rounded to 6).

    Scale: the lag/row_number columns share one (key, order) window sort
    (one Exchange); the reduction is a map-side-combinable groupBy with
    O(1) state per key.
    """
    w = Window.partitionBy("key").orderBy("pos")
    w_desc = Window.partitionBy("key").orderBy(F.col("pos").desc())
    x = F.col("__x")
    lag1, lag2 = F.lag("__x", 1).over(w), F.lag("__x", 2).over(w)
    staged = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(order_col).alias("pos"),
            F.col(value_col).cast("decimal(18,4)").alias("__x"),
            F.col(value_col).alias("__x_raw"),
        )
        .select(
            "key",
            "__x",
            "__x_raw",
            lag1.alias("__l1"),
            lag2.alias("__l2"),
            F.row_number().over(w).alias("__rn"),
            F.row_number().over(w_desc).alias("__rd"),
        )
    )
    agg = staged.groupBy("key").agg(
        F.count("__x").alias("n"),
        F.count("__x_raw").alias("n_raw"),
        F.sum(x.cast(_DEC)).alias("s"),
        F.sum((x * x).cast(_DEC)).alias("q0"),
        F.sum((x * F.col("__l1")).cast(_DEC)).alias("p1"),
        F.sum((x * F.col("__l2")).cast(_DEC)).alias("p2"),
        F.max(F.when(F.col("__rn") == 1, x)).alias("h1"),
        F.max(F.when(F.col("__rn") == 2, x)).alias("h2"),
        F.max(F.when(F.col("__rd") == 1, x)).alias("t1"),
        F.max(F.when(F.col("__rd") == 2, x)).alias("t2"),
    )
    n = F.coalesce(
        F.assert_true(F.col("n") == F.col("n_raw"), F.lit(_WELCH_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("n"),
    ).cast("double")
    s = _dec_double(F.col("s"))
    q0 = _dec_double(F.col("q0"))
    p1 = _dec_double(F.col("p1"))
    p2 = _dec_double(F.col("p2"))
    h1, h2 = F.col("h1").cast("double"), F.col("h2").cast("double")
    t1, t2 = F.col("t1").cast("double"), F.col("t2").cast("double")
    m = s / n
    c0 = q0 / n - m * m
    c1 = (p1 - m * (s - t1) - m * (s - h1) + (n - 1) * m * m) / n
    c2 = (p2 - m * (s - t1 - t2) - m * (s - h1 - h2) + (n - 2) * m * m) / n
    # CaseWhen short-circuits, so the divides never see c0 = 0 (constant
    # series) under ANSI mode
    r1 = F.when(c0 > 0, c1 / c0)
    r2 = F.when(c0 > 0, c2 / c0)
    denom = 1.0 - r1 * r1
    ok = (F.col("n") >= min_len) & (c0 > 0) & (F.abs(denom) > 1e-12)
    phi1 = F.when(ok, r1 * (1.0 - r2) / denom)
    phi2 = F.when(ok, (r2 - r1 * r1) / denom)
    forecast = m + phi1 * (t1 - m) + phi2 * (t2 - m)
    return agg.select(
        "key",
        F.col("n"),
        F.round(m, 6).alias("mean"),
        F.round(F.when(ok, r1), 6).alias("r1"),
        F.round(F.when(ok, r2), 6).alias("r2"),
        F.round(phi1, 6).alias("phi1"),
        F.round(phi2, 6).alias("phi2"),
        F.round(forecast, 6).alias("forecast"),
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    last_k: int = 50,
) -> DataFrame:
    """Final EWMA state per series: s₁ = x₁, s_t = α·x_t + (1−α)·s_{t−1}
    over the last ``last_k`` observations of each key.

    The recursion is inherently sequential, so it runs as an ordered left
    fold over a bounded pos-sorted list (the ``lm_kn`` sorted-fold idiom
    upgraded to a seeded recursion): one keyed window exchange computes
    reverse row numbers, rows beyond ``last_k`` are dropped, and the
    per-key fold touches at most ``last_k`` elements — the bounded-list
    contract that keeps ``collect_list`` scale-safe. DuckDB replays the
    fold with ``list_reduce`` over the same sorted struct list (both
    engines seed with the list head). Every step is deterministic IEEE
    double arithmetic on identical inputs — VALUE-portable.

    Returns one row per key: key, n_used, last_value, ewma (rounded 6).
    """
    w_desc = Window.partitionBy("key").orderBy(F.col("pos").desc())
    tail = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(order_col).alias("pos"),
            F.col(value_col).cast("double").alias("x"),
        )
        .withColumn("__rd", F.row_number().over(w_desc))
        .filter(F.col("__rd") <= last_k)
    )
    arr = F.sort_array(F.collect_list(F.struct(F.col("pos"), F.col("x"))))
    folded = tail.groupBy("key").agg(
        F.count("x").alias("n_used"),
        F.max(F.when(F.col("__rd") == 1, F.col("x"))).alias("last_value"),
        F.aggregate(
            F.slice(arr, 2, last_k),
            F.element_at(arr, 1)["x"],
            lambda acc, e: F.lit(float(alpha)) * e["x"]
            + F.lit(1.0 - float(alpha)) * acc,
        ).alias("ewma_raw"),
    )
    return folded.select(
        "key",
        "n_used",
        F.round(F.col("last_value"), 6).alias("last_value"),
        F.round(F.col("ewma_raw"), 6).alias("ewma"),
    )


def acf_by_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    max_lag: int = 5,
) -> DataFrame:
    """Per-key autocorrelation function r_1..r_k plus the Ljung-Box Q
    statistic — the diagnostic completion of the AR(2)/EWMA tier.

    Cleared-denominator exactness (the ar2_yule_walker recipe): with
    S = Σx and per-lag exact DECIMAL sums (sxy_l = Σ x_t·x_{t−l},
    sa_l/sb_l = the aligned partial sums over the valid range),

        n²·c_l = n²·sxy_l − n·S·(sa_l + sb_l) + (n−l)·S²
        r_l    = n²c_l / n²c_0

    every input is an exact DECIMAL converted through the floor/frac
    split, so r_l is a fixed IEEE expression — VALUE-oracle-able. The
    Ljung-Box Q = n(n+2)·Σ_l r_l²/(n−l) folds its k terms in sorted
    order (the lm_kn idiom). Keys with n ≤ max_lag drop (no full lag
    range). ONE keyed window exchange (all k lags share it) + one moment
    groupBy.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    k = int(max_lag)
    w = Window.partitionBy("key").orderBy("o")
    xd = F.col(value_col).cast("decimal(18,4)")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(order_col).alias("o"),
        xd.alias("x"),
    )
    staged = base.select(
        "key",
        "x",
        *[F.lag("x", l).over(w).alias(f"xl{l}") for l in range(1, k + 1)],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.count("x").alias("n_x"),
        F.sum(F.col("x").cast(_DEC)).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
    ]
    for l in range(1, k + 1):
        xl = F.col(f"xl{l}")
        aggs += [
            F.sum((F.col("x") * xl).cast(_DEC)).alias(f"sxy{l}"),
            F.sum(F.when(xl.isNotNull(), F.col("x").cast(_DEC))).alias(f"sa{l}"),
            F.sum(F.when(xl.isNotNull(), xl.cast(_DEC))).alias(f"sb{l}"),
        ]
    mom = staged.groupBy("key").agg(*aggs).where(F.col("n") > k)
    n_ok = F.coalesce(
        F.assert_true(
            F.col("n") == F.col("n_x"),
            F.lit(
                "acf_by_key: value magnitude >= 1e14 overflows the "
                "DECIMAL(18,4) cast to NULL under non-ANSI Spark; pre-scale"
            ),
        ).cast("long"),
        F.col("n"),
    )
    n = n_ok.cast("double")
    s = _dec_double(F.col("s"))
    c0 = n * n * _dec_double(F.col("sxx")) - n * s * s
    cols = [F.col("key"), F.col("n")]
    r_exprs = []
    for l in range(1, k + 1):
        nl = n - F.lit(float(l))
        num = (
            n * n * _dec_double(F.col(f"sxy{l}"))
            - n * s * (_dec_double(F.col(f"sa{l}")) + _dec_double(F.col(f"sb{l}")))
            + nl * s * s
        )
        r = F.when(c0 > 0, num / c0)
        r_exprs.append(r)
        cols.append(F.round(r, 6).alias(f"acf{l}"))
    lb_terms = F.array(
        *[
            (r * r) / (n - F.lit(float(l)))
            for l, r in zip(range(1, k + 1), r_exprs)
        ]
    )
    q = n * (n + 2.0) * F.aggregate(
        F.sort_array(lb_terms), F.lit(0.0), lambda a, x: a + x
    )
    cols.append(F.round(q, 6).alias("lb_q"))
    return mom.select(*cols).orderBy("key")
