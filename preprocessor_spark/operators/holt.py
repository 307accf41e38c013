"""Holt linear-trend exponential smoothing — per-series distributed fit.

The forecasting completion of the ts tier (`ts_features.py` describes
series, `matrix_profile.py` mines them, this extrapolates them): additive
Holt (level + trend) with fixed smoothing parameters,

    l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
    b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    ŷ_{t+h} = l_t + h·b_t

initialized the textbook way (l_1 = y_1, b_1 = y_2 − y_1). α=β=1 degrades
to the naive drift forecast; β=0 to simple exponential smoothing with
trend frozen at its init — both asserted in tests.

Scale shape — the `ts_spectral` gather contract: ONE keyed repartition +
groupBy collapses each series to a sorted (order, value) array (bounded by
series length, the caller's contract), then ONE Arrow-batched applyInPandas
stage runs the O(n) recursion per series in numpy. Series count is the
parallelism axis; nothing is collected. VALUE-oracled since round 10: the
post-drain recursion is a seeded ordered left fold, replayed in DuckDB
with a two-phase struct-accumulator ``list_reduce`` (straight-line
reference test retained).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def holt_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key Holt fit + h-step-ahead forecasts.

    Returns one row per key: n, final level, final trend, in-sample
    one-step-ahead RMSE, and ``forecast`` as an array of ``horizon``
    values (l_n + h·b_n). Keys with < 2 observations are dropped (no
    trend is identifiable) — count them upstream if the gap matters.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError(f"alpha in (0,1], beta in [0,1]; got {alpha}, {beta}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")

    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pair = F.struct(
        F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v")
    )
    gathered = (
        df.where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        # explicit keyed repartition: the Arrow stage is Python-compute
        # bound and the gathered frame is tiny — AQE's byte-based
        # coalescing would serialize it onto one task (the ts_spectral
        # lesson, measured 20.9 s -> ~2 s at sf0.1)
        .repartition(n_part, key_col)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list(pair)).alias("series"))
    )
    key_field = gathered.schema[key_col]
    schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("n", T.LongType(), False),
            T.StructField("level", T.DoubleType(), True),
            T.StructField("trend", T.DoubleType(), True),
            T.StructField("rmse", T.DoubleType(), True),
            T.StructField("forecast", T.ArrayType(T.DoubleType()), True),
        ]
    )
    a, b_, h = float(alpha), float(beta), int(horizon)

    def fit(batches):
        import pandas as pd

        cols = [f.name for f in schema.fields]
        for pdf in batches:  # gathered is one row per key already
            out = []
            for key, series in zip(pdf[key_col], pdf["series"]):
                vals = np.array([p["v"] for p in series], dtype=np.float64)
                n = len(vals)
                if n < 2:
                    continue
                lvl, tr = vals[0], vals[1] - vals[0]
                sse = 0.0
                for t in range(1, n):
                    err = vals[t] - (lvl + tr)
                    sse += err * err
                    new_lvl = a * vals[t] + (1.0 - a) * (lvl + tr)
                    tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
                    lvl = new_lvl
                out.append(
                    {
                        key_col: key,
                        "n": n,
                        "level": round(lvl, 6),
                        "trend": round(tr, 6),
                        "rmse": round(float(np.sqrt(sse / (n - 1))), 6),
                        "forecast": [round(lvl + (i + 1) * tr, 6) for i in range(h)],
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return gathered.mapInPandas(fit, schema=schema)


def backtest_naive_metrics(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    season: int,
    holdout: int,
) -> DataFrame:
    """Per-key forecast backtest against the SEASONAL-NAIVE baseline —
    the evaluation half of the forecasting tier (Hyndman & Koehler 2006:
    MASE is the scale-free standard; sMAPE the legacy M-competition one).

    The last ``holdout`` rows of each series are the test set; the
    forecast for a test row is the value one ``season`` back
    (ŷ_t = y_{t−m}); the MASE denominator is the in-sample one-step naive
    MAE over the training prefix. Returns one row per key: (key, n,
    n_eval, mae, rmse, mase, smape) — keys whose test rows all lack a
    seasonal lag (series shorter than season) drop out.

    Engine portability: values quantize to DECIMAL(18,4), so errors and
    their sums/squares stay exact DECIMAL; MASE/RMSE are deterministic
    doubles over exact sums; sMAPE's per-row double ratios fold in
    position order over a bounded collect (series-length contract — the
    repo-wide sorted-fold idiom). VALUE-oracled.

    Scale shape: ONE per-key window exchange + one map-side-combinable
    groupBy. No Arrow stage, no driver state.
    """
    from pyspark.sql import Window

    if holdout < 1 or season < 1:
        raise ValueError("season and holdout must be >= 1")
    x = F.col(value_col).cast("decimal(18,4)")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(order_col)
    wf = Window.partitionBy(key_col)
    rows = base.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wf).alias("n"),
        x.alias("xd"),
        F.lag(x, season).over(w).alias("xlag_m"),
        F.lag(x, 1).over(w).alias("xlag_1"),
    )
    is_test = F.col("pos") > (F.col("n") - F.lit(holdout))
    e = F.col("xd") - F.col("xlag_m")  # exact DECIMAL test error
    d1 = F.col("xd") - F.col("xlag_1")  # exact DECIMAL in-sample naive error
    test_ok = is_test & F.col("xlag_m").isNotNull()
    train_ok = (~is_test) & F.col("xlag_1").isNotNull()
    # sMAPE per-row ratio (double), folded in pos order over the bounded
    # holdout list
    ratio = F.when(
        test_ok,
        F.struct(
            F.col("pos").alias("pos"),
            (
                F.lit(2.0) * F.abs(e).cast("double")
                / (F.abs(F.col("xd")).cast("double")
                   + F.abs(F.col("xlag_m")).cast("double"))
            ).alias("r"),
        ),
    )
    agg = rows.groupBy("key").agg(
        F.max("n").alias("n"),
        F.count(F.when(test_ok, F.lit(1))).alias("n_eval"),
        F.sum(F.when(test_ok, F.abs(e))).alias("sae"),
        F.sum(F.when(test_ok, (e * e).cast("decimal(38,8)"))).alias("sse"),
        F.count(F.when(train_ok, F.lit(1))).alias("n_tr"),
        F.sum(F.when(train_ok, F.abs(d1))).alias("sad"),
        F.aggregate(
            F.sort_array(F.collect_list(ratio)),
            F.lit(0.0),
            lambda acc, s: acc + s["r"],
        ).alias("ratio_sum"),
    )
    n_eval = F.col("n_eval").cast("double")
    mae = F.col("sae").cast("double") / n_eval
    rmse = F.sqrt(F.col("sse").cast("double") / n_eval)
    scale = F.col("sad").cast("double") / F.col("n_tr").cast("double")
    return (
        agg.where(F.col("n_eval") > 0)
        .select(
            "key",
            "n",
            "n_eval",
            F.round(mae, 6).alias("mae"),
            F.round(rmse, 6).alias("rmse"),
            F.round(
                F.when((F.col("n_tr") > 0) & (scale > 0), mae / scale), 6
            ).alias("mase"),
            F.round(F.lit(100.0) * F.col("ratio_sum") / n_eval, 6).alias("smape"),
        )
    )


def holt_winters_forecast(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    season: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key ADDITIVE Holt-Winters (level + trend + seasonality) — the
    triple-smoothing completion of :func:`holt_forecast`.

    Textbook additive form (Hyndman & Athanasopoulos, fpp3 §8.3), with the
    two-season initialization — l_m = mean(y_1..y_m), b_m =
    (mean(y_{m+1}..y_{2m}) − l_m)/m, s_i = y_i − l_m for i ≤ m — and the
    recursion running from t = m+1 (each step's seasonal lag s_{t−m}
    exists from the init onward):

        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ(y_t − l_t) + (1−γ)·s_{t−m}
        ŷ_{n+h} = l_n + h·b_n + s_{n+h−m·⌈h/m⌉}

    γ=0 freezes the seasonal profile at its init (asserted in tests);
    season=1 with all-zero seasonals degrades to plain Holt. Keys with
    fewer than 2·season observations are dropped (the init is not
    identifiable). In-sample RMSE covers the recursion span (t > m).

    Scale shape — identical to holt_forecast: ONE keyed repartition +
    groupBy gathers each series (bounded length contract), ONE
    Arrow-batched mapInPandas stage runs the O(n) recursion in numpy.
    VALUE-oracled since round 10 (two-phase list-ring DuckDB fold — see
    the forecast_hw_users oracle) alongside planted-signal recovery,
    parameter-degeneracy, and exact stream-twin equivalence tests.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0) or not (0.0 <= gamma <= 1.0):
        raise ValueError(f"alpha in (0,1], beta/gamma in [0,1]; got {alpha}, {beta}, {gamma}")
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")

    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pair = F.struct(
        F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v")
    )
    gathered = (
        df.where(F.col(value_col).isNotNull() & F.col(order_col).isNotNull())
        .repartition(n_part, key_col)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list(pair)).alias("series"))
    )
    key_field = gathered.schema[key_col]
    schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("n", T.LongType(), False),
            T.StructField("level", T.DoubleType(), True),
            T.StructField("trend", T.DoubleType(), True),
            T.StructField("seasonal", T.ArrayType(T.DoubleType()), True),
            T.StructField("rmse", T.DoubleType(), True),
            T.StructField("forecast", T.ArrayType(T.DoubleType()), True),
        ]
    )
    a, b_, g, m, h = float(alpha), float(beta), float(gamma), int(season), int(horizon)

    def fit(batches):
        import pandas as pd

        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out = []
            for key, series in zip(pdf[key_col], pdf["series"]):
                vals = np.array([p["v"] for p in series], dtype=np.float64)
                n = len(vals)
                if n < 2 * m:
                    continue
                lvl = float(vals[:m].mean())
                tr = float((vals[m : 2 * m].mean() - vals[:m].mean()) / m)
                seas = [float(v - lvl) for v in vals[:m]]  # s_1..s_m
                sse, cnt = 0.0, 0
                for t in range(m, n):
                    s_lag = seas[t - m]
                    err = vals[t] - (lvl + tr + s_lag)
                    sse += err * err
                    cnt += 1
                    new_lvl = a * (vals[t] - s_lag) + (1.0 - a) * (lvl + tr)
                    tr = b_ * (new_lvl - lvl) + (1.0 - b_) * tr
                    lvl = new_lvl
                    seas.append(g * (vals[t] - lvl) + (1.0 - g) * s_lag)
                last_season = seas[-m:]
                fc = [
                    round(lvl + (i + 1) * tr + last_season[i % m], 6)
                    for i in range(h)
                ]
                out.append(
                    {
                        key_col: key,
                        "n": n,
                        "level": round(lvl, 6),
                        "trend": round(tr, 6),
                        "seasonal": [round(s, 6) for s in last_season],
                        "rmse": round(float(np.sqrt(sse / cnt)), 6),
                        "forecast": fc,
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    return gathered.mapInPandas(fit, schema=schema)
